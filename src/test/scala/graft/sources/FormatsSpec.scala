package graft.sources

import graft.SparkSpec
import graft.rdf.Triples

class FormatsSpec extends SparkSpec {


  test("triples survive a write/read roundtrip in every supported format") {
    val triples = Triples.build(spark, sf0001)
    val n = triples.count()
    for (fmt <- Formats.supported) {
      val dir = new java.io.File(s"target/fmt-roundtrip-$fmt")
      rmTree(dir)
      Formats.write(triples, dir.getPath, fmt)
      val back = Formats.read(spark, dir.getPath, fmt, Some(triples.schema))
      assert(back.count() === n, s"$fmt row count")
      assert(back.exceptAll(triples).count() === 0, s"$fmt contents")
      assert(triples.exceptAll(back).count() === 0, s"$fmt contents reverse")
    }
  }
}
