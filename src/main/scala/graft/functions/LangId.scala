package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Char-bigram Naive Bayes language identification — the real lang-id
  * operator behind `text_lang_id` (replacing the round-1..6 stopword-marker
  * heuristic, which was the one text-pipeline stage a production user would
  * swap out on day one; ref analogue: language gating before corpus mixing,
  * cf. CCNet / fastText lang-id usage in pretraining pipelines).
  *
  * Model: per-language char-bigram log-probabilities with Laplace add-one
  * smoothing, trained at BUILD TIME from bundled seed paragraphs (original
  * sentences written for this repo — no external data, no egress). The
  * model is DENSE over the 28-char alphabet (a-z, space, `_` = any other
  * char), so every bigram of any normalized input exists for every language
  * — scoring needs no out-of-vocabulary branch and an inner join can never
  * drop a bigram.
  *
  * Determinism discipline (the property that keeps the DuckDB oracle
  * hash-matched): log-probs are frozen to integer micro-nats with
  * StrictMath.log (bit-identical on every JVM), scores are integer SUMS
  * (addition-order-free at any parallelism), and the argmax tie-breaks by
  * language code ascending. The classify plan is one codegen'd
  * normalize+explode pass, one broadcast join against the 4704-row model,
  * and one partially-aggregated groupBy — the corpus never shuffles wide.
  *
  * Scope: Latin-script languages (en, es, fr, de, it, pt). Non-Latin
  * scripts normalize to `_` runs and fall wherever `_` mass is least
  * penalized — extending coverage = adding a seed paragraph (and, for CJK,
  * widening the alphabet), not changing the algorithm.
  */
object LangId {

  /** Original seed paragraphs (authored for this repo): common words,
    * correct orthography, ~650-700 chars each. The second paragraph of
    * each language is a PARALLEL text (same content, translated), which
    * makes the bigram statistics contrastive exactly where close language
    * pairs (es/pt, es/it) differ — held-out fixtures in LangIdSpec pin the
    * resulting accuracy.
    */
  private[graft] val seeds: Map[String, String] = Map(
    "en" -> ("all people are born free and equal in dignity and rights. " +
      "the quick brown fox jumps over the lazy dog near the river bank. " +
      "this is a short english text with many common words that the model " +
      "can learn from. what time is it and where are we going today? " +
      "the children were reading their books in the old library yesterday. " +
      "there is nothing better than a good talk with old friends when the " +
      "evening comes and the work is finally done. the boy wrote a letter " +
      "to his grandmother and then went out to play in the street with his " +
      "younger brother. we are going to take a very long trip next summer " +
      "and we will stay in a small house near the sea."),
    "es" -> ("todos los seres humanos nacen libres e iguales en dignidad y " +
      "derechos. el perro salta sobre la casa y la niña come una manzana " +
      "roja. esta es una frase corta en español con muchas palabras comunes " +
      "que el modelo puede aprender. cuándo vamos a la playa y qué hora es " +
      "ahora mismo? los niños estaban leyendo sus libros en la biblioteca. " +
      "no hay nada mejor que una buena charla con los viejos amigos cuando " +
      "llega la noche y el trabajo ya ha terminado. el niño escribió una " +
      "carta para su abuela y después salió a jugar a la calle con su " +
      "hermano menor. nosotros vamos a hacer un viaje muy largo el próximo " +
      "verano y nos quedaremos en una pequeña casa cerca del mar."),
    "fr" -> ("tous les êtres humains naissent libres et égaux en dignité et " +
      "en droits. le chien saute sur la maison et la fille mange une pomme " +
      "rouge. ceci est une phrase courte en français avec beaucoup de mots " +
      "communs que le modèle peut apprendre. quand allons nous à la plage " +
      "et quelle heure est il maintenant? les enfants lisaient leurs livres. " +
      "il n'y a rien de mieux qu'une bonne discussion avec de vieux amis " +
      "quand le soir arrive et que le travail est enfin terminé. le garçon " +
      "a écrit une lettre à sa grand mère et puis il est sorti jouer dans " +
      "la rue avec son petit frère. nous allons faire un très long voyage " +
      "l'été prochain et nous resterons dans une petite maison près de la mer."),
    "de" -> ("alle menschen sind frei und gleich an würde und rechten " +
      "geboren. der hund springt über das haus und das mädchen isst einen " +
      "roten apfel. dies ist ein kurzer deutscher text mit vielen häufigen " +
      "wörtern die das modell lernen kann. wann gehen wir zum strand und " +
      "wie spät ist es jetzt? die kinder lasen gestern ihre bücher. " +
      "es gibt nichts besseres als ein gutes gespräch mit alten freunden " +
      "wenn der abend kommt und die arbeit endlich getan ist. der junge " +
      "schrieb einen brief an seine großmutter und ging dann mit seinem " +
      "jüngeren bruder auf der straße spielen. wir werden nächsten sommer " +
      "eine sehr lange reise machen und in einem kleinen haus am meer wohnen."),
    "it" -> ("tutti gli esseri umani nascono liberi ed eguali in dignità e " +
      "diritti. il cane salta sopra la casa e la ragazza mangia una mela " +
      "rossa. questa è una frase breve in italiano con molte parole comuni " +
      "che il modello può imparare. quando andiamo in spiaggia e che ora è " +
      "adesso? i bambini leggevano i loro libri nella vecchia biblioteca. " +
      "non c'è niente di meglio di una buona chiacchierata con i vecchi " +
      "amici quando arriva la sera e il lavoro è finalmente finito. il " +
      "ragazzo ha scritto una lettera a sua nonna e poi è uscito a giocare " +
      "in strada con il suo fratello minore. noi faremo un viaggio molto " +
      "lungo la prossima estate e staremo in una piccola casa vicino al mare."),
    "pt" -> ("todos os seres humanos nascem livres e iguais em dignidade e " +
      "direitos. o cão salta sobre a casa e a menina come uma maçã " +
      "vermelha. esta é uma frase curta em português com muitas palavras " +
      "comuns que o modelo pode aprender. quando vamos à praia e que horas " +
      "são agora? as crianças estavam lendo os seus livros na biblioteca. " +
      "não há nada melhor do que uma boa conversa com os velhos amigos " +
      "quando a noite chega e o trabalho já terminou. o menino escreveu " +
      "uma carta para a sua avó e depois foi brincar na rua com o seu " +
      "irmão mais novo. nós vamos fazer uma viagem muito longa no próximo " +
      "verão e ficaremos numa pequena casa perto do mar. eu quero aprender " +
      "a falar melhor e por isso leio um pouco todos os dias. ela disse que " +
      "a porta estava aberta mas ninguém podia entrar naquele momento. os " +
      "dados mostram que as coisas podem mudar depressa quando todos " +
      "trabalham juntos. você pode ver o rio da janela do seu quarto."))

  /** The 28-char alphabet: letters, space, and `_` for everything else. */
  private val alphabet: IndexedSeq[Char] = ('a' to 'z') :+ ' ' :+ '_'

  /** lowercase + collapse everything outside [a-z ] to `_` — the SAME rule
    * both engines apply at scoring time (`[^a-z ]` is in the Java-regex ∩
    * RE2 ∩ DuckDB-regex common subset).
    */
  private def normalizeJvm(s: String): String =
    s.toLowerCase.replaceAll("[^a-z ]", "_")

  /** (lang, bigram, log-prob in integer micro-nats), dense: 784 bigrams ×
    * 6 languages. Laplace add-one over the 784-bigram event space;
    * StrictMath.log is bit-identical on every JVM, so the Spark plan and
    * the generated oracle literal can never disagree on a model weight.
    */
  val modelRows: Seq[(String, String, Long)] = {
    val all = for ((a, b) <- alphabet.flatMap(a => alphabet.map(b => (a, b))))
      yield s"$a$b"
    seeds.toSeq.sortBy(_._1).flatMap { case (lang, seed) =>
      val t = normalizeJvm(seed)
      val counts = t.sliding(2).toSeq.groupBy(identity).view.mapValues(_.size)
      val total = t.length - 1
      all.map { bg =>
        val p = (counts.getOrElse(bg, 0) + 1).toDouble / (total + all.size)
        (lang, bg, math.round(StrictMath.log(p) * 1e6))
      }
    }
  }

  /** Spark-side normalization of a text column (codegen'd). */
  def normalized(text: Column): Column =
    regexp_replace(lower(text), "[^a-z ]", "_")

  /** Bigram scoring is bounded to this many normalized chars. Language is
    * a document-level property — the first few hundred chars decide it —
    * so the per-doc explode→join→agg stream is capped at a constant 511
    * bigram rows regardless of document length (the same bounded-scan
    * discipline as dedup_edit_verify's 256-char DP). The normalize pass
    * itself stays O(len) (one codegen'd regex map); what the cap removes
    * is the length-proportional join+aggregate volume, the dominant cost
    * at corpus scale.
    */
  val ScorePrefixChars = 512

  /** Classify `(doc_id, text)` rows → `(doc_id, lang_pred, margin_micro)`.
    *
    * margin_micro = best score − runner-up score in micro-nats: the
    * confidence signal a mixing pipeline thresholds on (0 = pure tie).
    * Documents whose normalized text is shorter than 2 chars have no
    * bigrams and are absent — the same contract as text_bigram_logprob.
    * Scoring reads the first [[ScorePrefixChars]] normalized chars (the
    * prefix is taken AFTER normalization, when the text is pure ASCII, so
    * both engines count the same units).
    */
  def classify(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val lm = modelRows.toDF("lang", "bg", "lpu")
    val bg = docs
      .select(col("doc_id"),
        substring(normalized(col("text")), 1, ScorePrefixChars).as("t"))
      .filter(length(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))")).as("bg"))
    val scored = bg.join(broadcast(lm), "bg")
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("lpu")).as("score"))
    // |langs|-element sorted struct list per doc: argmax + runner-up in one
    // hash aggregate, no window over the corpus
    scored.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(
        struct((-col("score")).as("ns"), col("lang").as("l")))).as("r"))
      .select(col("doc_id"),
        col("r")(0).getField("l").as("lang_pred"),
        (col("r")(1).getField("ns") - col("r")(0).getField("ns")).as("margin_micro"))
  }

  /** The model as a DuckDB VALUES body (shared by every oracle that scores
    * languages, so the weights can never drift between oracles).
    */
  lazy val modelValuesSql: String =
    modelRows.map { case (l, bg, lpu) =>
      val esc = bg.replace("'", "''")
      s"('$l','$esc',$lpu)"
    }.mkString(",")

  /** Canonical DuckDB SQL replicating [[classify]] over `documents`. */
  lazy val langIdSql: String = s"""
      WITH m(lang, bg, lpu) AS (VALUES $modelValuesSql),
      n AS (SELECT doc_id,
                   substr(regexp_replace(lower(text), '[^a-z ]', '_', 'g'),
                          1, $ScorePrefixChars) AS t
            FROM documents),
      b AS (SELECT doc_id, substr(t, i, 2) AS bg
            FROM (SELECT * FROM n WHERE length(t) >= 2),
                 LATERAL (SELECT unnest(range(1, length(t))) AS i) r),
      sc AS (SELECT doc_id, lang, CAST(sum(lpu) AS BIGINT) AS score
             FROM b JOIN m USING (bg) GROUP BY 1, 2),
      rk AS (SELECT doc_id, lang, score,
                    row_number() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, lang) AS rk
             FROM sc)
      SELECT a.doc_id, a.lang AS lang_pred,
             CAST(a.score - b.score AS BIGINT) AS margin_micro
      FROM rk a JOIN rk b ON a.doc_id = b.doc_id AND b.rk = 2
      WHERE a.rk = 1"""
}
