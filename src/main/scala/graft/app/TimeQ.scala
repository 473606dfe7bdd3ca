package graft.app
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = BenchUtil.newSession(32, 32)
    val dir = "/root/testdata/sf0.1"
    for (q <- args) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      println(f"[timeq] $q: ${(System.nanoTime()-t0)/1e9}%.1f s, $n rows")
    }
    spark.stop()
  }
}
