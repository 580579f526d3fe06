package graft.sources

import java.io.File
import org.scalatest.funsuite.AnyFunSuite

class AtomicStoreSpec extends AnyFunSuite {

  private def freshBase(name: String): String =
    java.nio.file.Files.createTempDirectory("as-spec").toString + "/" + name

  test("partial stores are rebuilt; complete stores are served untouched") {
    val base = freshBase("store")
    // a partial leftover: directory exists but carries no completion marker
    // (crash between writes, or a /tmp cleaner ate files)
    new File(base).mkdirs()
    new File(base, "half.parquet").createNewFile()
    var builds = 0
    AtomicStore.materialize(base) { tmp =>
      builds += 1
      new File(tmp).mkdirs()
      new File(tmp, "data").createNewFile()
    }
    assert(builds === 1)
    assert(!new File(base, "half.parquet").exists(), "partial content discarded")
    assert(new File(base, "data").exists())
    // second call: complete store served, builder not invoked
    AtomicStore.materialize(base)(_ => builds += 1)
    assert(builds === 1)
  }

  test("a failed build propagates and leaves no temp directories behind") {
    val base = freshBase("store2")
    val parent = new File(base).getParentFile
    val boom = intercept[RuntimeException](
      AtomicStore.materialize(base) { tmp =>
        new File(tmp).mkdirs()
        new File(tmp, "partial").createNewFile()
        throw new RuntimeException("builder failed")
      })
    assert(boom.getMessage === "builder failed")
    assert(!new File(base).exists(), "failed build must not publish")
    val leftovers = Option(parent.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.contains(".build."))
    assert(leftovers.isEmpty, s"temp dirs leaked: ${leftovers.mkString(", ")}")
    // and the store is rebuildable after the failure
    AtomicStore.materialize(base) { tmp =>
      new File(tmp).mkdirs()
      new File(tmp, "data").createNewFile()
    }
    assert(new File(base, "data").exists())
  }
}
