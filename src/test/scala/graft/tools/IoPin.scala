package graft.tools

/** Re-pin helper for [[graft.Bench.ioAnchorSec]]'s `IoAnchorRefSec`
  * reference: prints N consecutive best-of-3 probe readings from this
  * JVM. Run across 2-3 JVMs on a quiet host and pin the minimum, the
  * same protocol as the CPU anchor's `AnchorRefSec`.
  */
object IoPin {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.flatMap(_.toIntOption).getOrElse(3)
    (1 to n).foreach { i =>
      val s = graft.Bench.ioAnchorSec()
      println(f"io_anchor reading $i: $s%.4f s")
    }
  }
}
