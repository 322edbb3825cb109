package graft.index

import graft.SparkT
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Object-store-safe compact commit (VERDICT r8 #7): the manifest scheme
  * never renames data — a compact writes a new immutable generation dir and
  * commits it with ONE small manifest object. Every crash interleaving
  * (half-written generation, partial/empty manifest version, manifest
  * naming a missing dir, commit-without-cleanup) must leave the index
  * readable and checkable through [[SecondaryIndex.resolve]]. */
class CompactCommitSpec extends AnyFunSuite {

  import SparkT.spark.implicits._

  private val spark = SparkT.spark
  private def fs(p: String) = new org.apache.hadoop.fs.Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val rows = (0 until 1200).map(i => (i.toLong % 9, i.toLong))
  private def want(v: Long): Set[Long] =
    rows.filter(_._1 == v).map(_._2).toSet

  private def lookup(d: String, v: Long): Set[Long] =
    SecondaryIndex.lookupKeys(spark, d, Seq(v)).as[Long].collect().toSet

  private def healthy(d: String): Unit = {
    assert(lookup(d, 4L) === want(4L))
    assert(SecondaryIndex.calcCount(spark, d, Seq(4L)) === want(4L).size.toLong)
    val rep = IndexCheck.check(spark, d)
    assert(rep.ok, rep.issues.mkString("; "))
  }

  test("manifest compact: single-object commit, every crash interleaving readable") {
    val d = Files.createTempDirectory("graft-mcommit").resolve("idx").toString
    val f = fs(d)
    SecondaryIndex.build(rows.toDF("value", "key"), "value", "key", d)
    healthy(d)
    assert(SecondaryIndex.resolve(spark, d) === d)

    // crash A: a half-written generation dir, no manifest — readers must
    // stay on the base dir, and the next compact must clobber the garbage
    val stray = new org.apache.hadoop.fs.Path(d + "__g1/part-junk")
    val out = f.create(stray, true); out.write(Array[Byte](1, 2, 3)); out.close()
    assert(SecondaryIndex.resolve(spark, d) === d)
    healthy(d)

    // first real compact: migrates the legacy dir into generation 1. The
    // superseded base dir is RETAINED one cycle (ADVICE r9: a reader that
    // resolved it pre-commit must finish on a consistent snapshot)
    SecondaryIndex.compactManifest(spark, d)
    assert(SecondaryIndex.resolve(spark, d).endsWith("__g1"))
    assert(f.exists(new org.apache.hadoop.fs.Path(d)),
      "previous live generation (legacy base) swept too early")
    // ...and marked, so resolve()'s fallback can never serve it as live
    assert(f.exists(new org.apache.hadoop.fs.Path(d + "/_GRAFT_SUPERSEDED")),
      "retained base dir not marked superseded")
    healthy(d)

    // crash B: partially-written newest manifest version (empty object) —
    // resolve must skip it and fall back to v1
    val v2 = new org.apache.hadoop.fs.Path(d + "_manifest/v2")
    f.create(v2, true).close()
    assert(SecondaryIndex.resolve(spark, d).endsWith("__g1"))
    healthy(d)

    // crash B': newest version names a generation that never finished
    // (commit object landed, data PUTs did not — not possible under the
    // write-then-commit order, but resolve tolerates it anyway)
    SecondaryIndex.writeManifest(f, d, 3L,
      new org.apache.hadoop.fs.Path(d + "__g99").getName)
    assert(SecondaryIndex.resolve(spark, d).endsWith("__g1"))
    healthy(d)

    // next compact: versions move past the junk (curVersion = 3 → gen 4),
    // reads flip atomically; g1 (live until this commit) is retained one
    // cycle while the base dir (past its retention cycle) is swept
    SecondaryIndex.compactManifest(spark, d)
    assert(SecondaryIndex.resolve(spark, d).endsWith("__g4"))
    assert(f.exists(new org.apache.hadoop.fs.Path(d + "__g1")),
      "previous live generation swept too early")
    assert(!f.exists(new org.apache.hadoop.fs.Path(d)),
      "base dir survived past its retention cycle")
    healthy(d)

    // appendSegment lands in the LIVE generation and compacts away
    val extra = (10000 until 10100).map(i => (i.toLong % 9, i.toLong))
    SecondaryIndex.appendSegment(extra.toDF("value", "key"), "value", "key", d)
    val wantAll = (rows ++ extra).filter(_._1 == 4L).map(_._2).toSet
    assert(lookup(d, 4L) === wantAll)
    SecondaryIndex.compactManifest(spark, d)
    assert(lookup(d, 4L) === wantAll)
    assert(!f.exists(new org.apache.hadoop.fs.Path(d + "__g1")),
      "generation survived past its one-cycle retention")
    val rep = IndexCheck.check(spark, d,
      fact = Some(((rows ++ extra).toDF("value", "key"), "value", "key")))
    assert(rep.ok, rep.issues.mkString("; "))

    // the rename-based compact refuses a manifest-managed dir
    intercept[IllegalArgumentException] {
      SecondaryIndex.compact(spark, d)
    }

    // ...and so does an in-place rebuild at the dead base path (r12): it
    // would be invisible to readers, who resolve to the live generation
    intercept[IllegalArgumentException] {
      SecondaryIndex.build(rows.toDF("value", "key"), "value", "key", d)
    }

    // orphan sweep (review r9): a crash between a PAST commit and its
    // cleanup leaves generations the next compact's `cur` would never
    // revisit — recreate that state and verify the sweep clears ALL of it
    val straleGen = new org.apache.hadoop.fs.Path(d + "__g2/part-stale")
    val o1 = f.create(straleGen, true); o1.write(Array[Byte](9)); o1.close()
    val straleBase = new org.apache.hadoop.fs.Path(d + "/part-stale")
    val o2 = f.create(straleBase, true); o2.write(Array[Byte](9)); o2.close()
    // rename-scheme leftover: if it survived, a later manifest-dir loss
    // would silently serve this stale copy through resolve()'s fallback
    val straleOld = new org.apache.hadoop.fs.Path(d + "_old/part-stale")
    val o3 = f.create(straleOld, true); o3.write(Array[Byte](9)); o3.close()
    SecondaryIndex.compactManifest(spark, d)
    assert(!f.exists(new org.apache.hadoop.fs.Path(d + "__g2")),
      "orphaned generation survived the sweep")
    assert(!f.exists(new org.apache.hadoop.fs.Path(d)),
      "recreated base dir survived the sweep")
    assert(!f.exists(new org.apache.hadoop.fs.Path(d + "_old")),
      "rename-scheme _old leftover survived the sweep")
    assert(lookup(d, 4L) === wantAll)
  }

  test("manifest loss with a retained superseded base fails loudly, never stale reads") {
    // review r10: retention keeps the pre-commit generation readable for
    // in-flight readers, but it must NEVER become a resolve() fallback —
    // losing the manifest dir then has to be an error, not silent stale
    // postings.
    val d = Files.createTempDirectory("graft-mloss").resolve("idx").toString
    val f = fs(d)
    SecondaryIndex.build(rows.toDF("value", "key"), "value", "key", d)
    SecondaryIndex.compactManifest(spark, d) // migrates, retains marked base
    assert(SecondaryIndex.resolve(spark, d).endsWith("__g1"))
    f.delete(new org.apache.hadoop.fs.Path(d + "_manifest"), true)
    val e = intercept[IllegalStateException] {
      SecondaryIndex.resolve(spark, d)
    }
    assert(e.getMessage.contains("superseded"))
  }
}
