package graft

import graft.functions.LangId

/** Accuracy + determinism contract of the char-bigram NB language
  * identifier (the operator behind text_lang_id). Fixtures are held-out
  * sentences — none appear in the seed paragraphs — so this measures
  * generalization of the bigram statistics, not memorization.
  */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  private val fixtures: Seq[(Long, String, String)] = Seq(
    // held-out English
    (1L, "the weather was cold this morning and the train arrived late again", "en"),
    (2L, "she wanted to know whether the answer would ever be found in the data", "en"),
    (3L, "a long walk through the forest is the best way to clear your head", "en"),
    // held-out Spanish
    (4L, "la reunión empezó tarde porque el tren llegó con mucho retraso", "es"),
    (5L, "quiero saber si la respuesta se puede encontrar en los datos", "es"),
    (6L, "un paseo largo por el bosque es la mejor manera de despejar la cabeza", "es"),
    // held-out French
    (7L, "la réunion a commencé en retard parce que le train est arrivé tard", "fr"),
    (8L, "je veux savoir si la réponse peut être trouvée dans les données", "fr"),
    (9L, "une longue promenade dans la forêt est la meilleure façon de réfléchir", "fr"),
    // held-out German
    (10L, "das wetter war heute morgen kalt und der zug kam wieder zu spät", "de"),
    (11L, "sie wollte wissen ob die antwort jemals in den daten gefunden wird", "de"),
    (12L, "ein langer spaziergang durch den wald ist gut für den kopf", "de"),
    // held-out Italian
    (13L, "la riunione è cominciata in ritardo perché il treno è arrivato tardi", "it"),
    (14L, "voglio sapere se la risposta si può trovare nei dati", "it"),
    (15L, "una lunga passeggiata nel bosco è il modo migliore per pensare", "it"),
    // held-out Portuguese
    (16L, "a reunião começou tarde porque o trem chegou muito atrasado", "pt"),
    (17L, "quero saber se a resposta pode ser encontrada nos dados", "pt"),
    (18L, "uma longa caminhada pela floresta é a melhor maneira de pensar", "pt"))

  test("model shape: dense 784 bigrams x 6 languages, negative micro-nat weights") {
    val byLang = LangId.modelRows.groupBy(_._1)
    assert(byLang.keySet == Set("en", "es", "fr", "de", "it", "pt"))
    byLang.foreach { case (lang, rows) =>
      assert(rows.size == 784, s"$lang: expected dense 28x28 bigram table")
      assert(rows.map(_._2).distinct.size == 784)
      assert(rows.forall(_._3 < 0L), s"$lang: log-probs must be negative")
    }
    // per-lang probabilities sum to ~1 (smoothed distribution sanity)
    byLang.foreach { case (lang, rows) =>
      val mass = rows.map(r => StrictMath.exp(r._3 / 1e6)).sum
      assert(math.abs(mass - 1.0) < 1e-3, s"$lang: probability mass $mass")
    }
  }

  test("held-out multilingual fixtures classify correctly") {
    val docs = fixtures.map { case (id, t, _) => (id, t) }.toDF("doc_id", "text")
    val got = LangId.classify(docs)
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    val wrong = fixtures.filter { case (id, _, want) => got(id) != want }
    assert(wrong.isEmpty,
      s"misclassified: ${wrong.map(f => s"doc ${f._1} want ${f._3} got ${got(f._1)}").mkString("; ")}")
  }

  test("margin is nonnegative and zero only on exact ties") {
    val docs = fixtures.map { case (id, t, _) => (id, t) }.toDF("doc_id", "text")
    val margins = LangId.classify(docs).select("margin_micro").as[Long].collect()
    assert(margins.forall(_ >= 0L))
    assert(margins.count(_ > 0L) == fixtures.size, "real sentences should never tie")
  }

  test("classification is deterministic and total over the synthetic corpus") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.tables.Tables.documents(spark, sf)
    val n = docs.count()
    val out = SparkEntry.queries("text_lang_id")(spark, sf)
    assert(out.count() == n, "every document classifies (all texts have >= 2 chars)")
    val again = SparkEntry.queries("text_lang_id")(spark, sf)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("too-short texts are absent; mixed text picks the dominant language") {
    val docs = Seq(
      (100L, "x"), // 1 normalized char -> no bigrams -> absent
      (101L, "the house is big y la casa es grande pero the house wins here today " +
        "because most of the words of this sentence are in english"))
      .toDF("doc_id", "text")
    val got = LangId.classify(docs).select("doc_id", "lang_pred")
      .as[(Long, String)].collect().toMap
    assert(!got.contains(100L))
    assert(got(101L) == "en")
  }

  test("scoring is bounded to the 512-char prefix: a contrary tail cannot flip it") {
    // first ~500 normalized chars are english; the tail is 4x as much
    // spanish — if the full text were scored the spanish mass would win,
    // so a correct "en" pins that classification reads ONLY the prefix
    // (the constant-work-per-doc contract at 100 TB)
    val en = "the children were reading their books in the old library and " +
      "the weather was cold this morning when the train arrived late again "
    val es = "los niños estaban leyendo sus libros en la biblioteca vieja y " +
      "el tiempo era muy frío esta mañana cuando el tren llegó tarde otra vez "
    val prefix = (en * 4).take(500)
    val tail = es * 16
    val docs = Seq((200L, prefix + " " + tail)).toDF("doc_id", "text")
    val got = LangId.classify(docs).select("doc_id", "lang_pred")
      .as[(Long, String)].collect().toMap
    assert(got(200L) == "en",
      s"prefix-bounded scoring must ignore the tail (got ${got(200L)})")
    // control: the same text scored WITHOUT the bound (tail dominant)
    // would be spanish — proven by classifying the tail alone
    val tailOnly = LangId.classify(Seq((201L, tail)).toDF("doc_id", "text"))
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(tailOnly(201L) == "es")
  }
}
