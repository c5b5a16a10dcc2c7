package graft.functions

import graft.SparkSpec

class LangIdSpec extends SparkSpec {

  test("detects common languages from characteristic trigrams") {
    assert(LangId.detect("the quick brown fox jumps over the lazy dog and runs to the hills") == "en")
    assert(LangId.detect("der schnelle braune fuchs springt über den faulen hund und rennt") == "de")
    assert(LangId.detect("le renard brun rapide saute par dessus le chien paresseux et les champs") == "fr")
    assert(LangId.detect("el rápido zorro marrón salta sobre el perro perezoso en el campo") == "es")
  }

  test("script detection shortcuts CJK and Cyrillic") {
    assert(LangId.detect("春眠不觉晓处处闻啼鸟") == "zh")
    assert(LangId.detect("быстрая коричневая лиса прыгает через ленивую собаку") == "ru")
  }

  test("empty/no-evidence inputs return und") {
    assert(LangId.detect("") == "und")
    assert(LangId.detect(null) == "und")
    assert(LangId.detect("0123 4567 89") == "und")
  }

  test("works over the documents table via the typed lane") {
    import spark.implicits._
    val langs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"text").as[String].map(LangId.detect).toDF("detected")
      .groupBy("detected").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // synthetic corpus is English word-soup regardless of its lang label
    assert(langs.keySet.contains("en"))
    assert(langs("en") > 0)
  }
}
