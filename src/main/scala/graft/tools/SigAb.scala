package graft.tools

import graft.functions.Vectors
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Same-JVM A/B for the hyperplane-signature kernel (r15): the old
  * form — `bits` independent native dot-products, each re-reading the
  * array<double> cast and its own literal weight array — vs the new
  * one-pass [[graft.functions.expr.HyperplaneSig]] expression.
  *
  * Both arms compute the 8-table signature block over the sf
  * embeddings (the shape vecBands feeds every LSH family member) and
  * reduce to one driver-side sum, so the measured work is exactly the
  * per-row kernel plus one scan. Arms alternate within one JVM per
  * the measurement discipline (ambient swings on this VM are 2-4×).
  *
  * Usage: runMain graft.tools.SigAb [sfDir] [reps]
  */
object SigAb {
  /** The pre-r15 composition, reconstructed verbatim for the A arm. */
  private def oldSig(v: Column, dim: Int, bits: Int, seed: Long): Column = {
    val weights = Vectors.hyperplaneWeights(dim, bits, seed)
    val vd = v.cast("array<double>")
    val bitCols = (0 until bits).map { b =>
      val w = array(weights(b).map(lit).toIndexedSeq: _*)
      val proj = graft.functions.expr.NativeFunctions.dot_product(vd, w)
      when(proj >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bitCols.reduce(_.bitwiseOR(_))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.Sessions.build(32, appName = "graft-sig-ab")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val (dim, bits, tables, seed) = (64, 16, 8, 42L)

    def run(sig: (Column, Int, Int, Long) => Column): Long = {
      val s = emb.select((0 until tables).map(t =>
        sig(col("embedding"), dim, bits, seed + t).as(s"s$t")): _*)
      s.select((0 until tables).map(t => sum(col(s"s$t"))): _*)
        .collect()(0).getLong(0)
    }

    run(oldSig); run(Vectors.hyperplaneSig) // warm both codegen paths
    for (r <- 1 to reps; (arm, f) <- Seq(
        "old-16dot" -> (oldSig _), "new-1pass" -> (Vectors.hyperplaneSig _))) {
      val t0 = System.nanoTime()
      val chk = run(f)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[sig-ab] $arm rep$r: $dt%6.3f s  checksum=$chk")
    }
    spark.stop()
  }
}
