package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the ANN recall-vs-cost Pareto table (`q_ann_pareto`):
  * the five legs answer the same panel over the same corpus, so the
  * frontier's dominance structure is a property of the methods, not
  * of the data draw:
  *  - the exhaustive leg is the ceiling: recall exactly 1.0 and the
  *    largest candidate count of any leg;
  *  - IVF recall is monotone in probes, and probing more cells costs
  *    strictly more candidates;
  *  - IVF-PQ scores the SAME candidate set as IVF probe-2 (identical
  *    cand_scored), with recall ≤ the uncompressed leg — the
  *    compression toll is visible, never hidden;
  *  - every leg's recall is in [0, 1] and hits are ≤ 5·queries. */
class AnnParetoSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val rows: Map[String, (Long, Long, Double)] =
    graft.Registry.all.find(_.name == "q_ann_pareto").get
      .run(spark, dir)
      .select("method", "cand_scored", "n_hit", "recall")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap

  test("exhaustive leg is the recall ceiling and the cost ceiling") {
    val (cand, hit, rec) = rows("1_exact_scan")
    assert(rec == 1.0 && hit == 40L)
    assert(rows.values.forall(_._1 <= cand),
      s"no approximate leg may scan more than exhaustive: $rows")
  }

  test("ivf: recall monotone in probes, cost strictly monotone") {
    val (c2, _, r2) = rows("2_ivf_probe2")
    val (c1, _, r1) = rows("4_ivf_probe1")
    assert(r2 >= r1, s"probe2 recall $r2 < probe1 $r1")
    assert(c2 > c1, s"probe2 candidates $c2 !> probe1 $c1")
  }

  test("ivfpq scores the identical candidate set, compressed") {
    val (cPq, _, rPq) = rows("3_ivfpq_probe2")
    val (cIvf, _, rIvf) = rows("2_ivf_probe2")
    assert(cPq == cIvf, "PQ must score exactly the probe-2 candidates")
    assert(rPq <= rIvf, s"compressed recall $rPq > uncompressed $rIvf")
  }

  test("all legs: sane ranges, all five present") {
    assert(rows.keySet == Set("1_exact_scan", "2_ivf_probe2",
      "3_ivfpq_probe2", "4_ivf_probe1", "5_graph_beam"))
    rows.foreach { case (m, (cand, hit, rec)) =>
      assert(cand > 0 && hit >= 0 && hit <= 40 && rec >= 0.0 && rec <= 1.0,
        s"$m out of range: ($cand, $hit, $rec)")
    }
  }
}
