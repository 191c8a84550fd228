package graft.debug
object BenchDebug {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.map(_.toInt).getOrElse(32)
    val (qps, f, d, ms) = graft.Bench.frontierRun(cpus,
      sys.env.getOrElse("H", "256").toInt, sys.env.getOrElse("P", "600").toInt)
    println(s"BENCHDBG cpus=$cpus qps=$qps fetched=$f deduped=$d ms=$ms")
  }
}
