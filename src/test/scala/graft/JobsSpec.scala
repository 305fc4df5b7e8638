package graft

import graft.jobs.JobsMain

/** End-to-end goldens for the drop-in CLI jobs: exact `key TAB value`
  * lines incl. Java Double.toString formatting and NaN. */
class JobsSpec extends SparkSpec {
  import spark.implicits._

  private def caa(airport: String, ad: String, n: Int, avg: Double): String =
    s"01-Jan-2018,201101,$airport,GB,NOWHERE,SOME AIR,$ad,S,$n,0,0,0,25,15,10,0,$avg,0,0,0,0"

  test("Delay job emits airport TAB arr,dep with NaN and Java toString") {
    val lines = spark.createDataset(Seq(
      caa("BIRMINGHAM", "A", 10, 2.5),   // round(25)=25 -> 25/10=2.5
      caa("BIRMINGHAM", "D", 3, 1.0),    // 3/3=1.0
      caa("ARRIVALSONLY", "A", 2, 0.7))) // round(1.4)=1 -> 0.5 ; dep NaN
    assert(JobsMain.delayLines(lines).collect().toSeq == Seq(
      "ARRIVALSONLY\t0.5,NaN",
      "BIRMINGHAM\t2.5,1.0"))
  }

  test("Late job emits airline,year TAB pct for ratios >= 50%") {
    // late% = 25+15+10+0 = 50 -> round(10*0.5)=5 -> 5/10=0.5 -> "50.0"
    val lines = spark.createDataset(Seq(caa("X", "D", 10, 1.0)))
    assert(JobsMain.lateLines(lines).collect().toSeq == Seq("SOME AIR,2011\t50.0"))
  }

  test("WordCount job counts whitespace tokens") {
    val lines = spark.createDataset(Seq("a b", "b\ta", "c"))
    assert(JobsMain.wordCountLines(lines).collect().toSeq ==
      Seq("a\t2", "b\t2", "c\t1"))
  }

  test("WebLog1/WebLog2 goldens (FIXTURES.md §B)") {
    val lines = spark.createDataset(Seq(
      "alice 2017-11-01 /index.html",
      "alice 2017-11-01 /index.html",
      "alice 2017-11-02 /a.html",
      "bob   2017-11-01 /index.html"))
    assert(JobsMain.webLog1Lines(lines).collect().toSeq == Seq("alice\t/index.html"))
    assert(JobsMain.webLog2Lines(lines).collect().toSeq == Seq("alice\t/index.html"))
  }
}
