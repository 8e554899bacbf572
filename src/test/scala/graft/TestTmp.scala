package graft

import java.nio.file.{Files, Path, Paths}

/** Test-side scratch dirs, recursively deleted at JVM exit — the spec
  * suites were stranding hundreds of store directories per `sbt test`
  * run (same leak class as VERDICT r5 #3 flagged in ops/). */
object TestTmp {
  private val created = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  def dir(prefix: String): String = {
    val d = Files.createTempDirectory(prefix).toString
    created.add(d)
    d
  }

  private def deleteRec(dir: String): Unit = {
    val root = Paths.get(dir)
    if (Files.exists(root)) {
      val s = Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally s.close()
    }
  }

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    created.forEach { d =>
      try deleteRec(d) catch { case _: Throwable => () }
    }
  }, "graft-testtmp-cleanup"))
}
