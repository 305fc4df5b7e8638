package graft

import org.apache.spark.sql.Row
import graft.operators.Pipeline
import graft.streaming.StreamDoor

/** q162 — the quantile-sketch door: the distribution state maintained
  * by a real stream must serve exactly the quantiles the batch-built
  * sketch serves, with the bucket-colocated zero-exchange read. */
class StreamQuantileDoorSpec extends SparkSpec {

  private lazy val door: Array[Row] =
    StreamDoor.streamQuantileDoor(spark, sfDir).collect()

  test("door-served quantiles equal the batch sketch's (q160) rows") {
    def qrows(rs: Array[Row]): Set[Seq[Any]] = rs
      .filter(r => !r.getString(0).startsWith("zz"))
      .map(_.toSeq).toSet
    val batch = Pipeline.quantileSketch(spark, sfDir).collect()
    assert(qrows(door) == qrows(batch),
      "stream-maintained and batch-maintained sketches must serve " +
        "identical quantile rows")
  }

  test("the serving read is bucket-colocated: zero hash exchanges") {
    val d = door.find(_.getString(0) == "zz_door_merge_zero_exchange").get
    assert(d.getLong(2) == 1L)
  }

  test("every served estimate's exact rank stays within one bucket") {
    door.filter(r => !r.getString(0).startsWith("zz")).foreach { r =>
      assert(r.getLong(6) == 1L, s"rank bound violated: $r")
    }
  }
}
