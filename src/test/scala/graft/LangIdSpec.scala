package graft

import org.apache.spark.sql.functions._

/** Accuracy floor for the char-trigram language-ID on GENUINELY
  * multilingual text. The synthetic documents table cannot measure
  * classifier quality — its `lang` labels are content-free (identical
  * vocabulary across labels, no marker words, no CJK), so any
  * content-based classifier scores only the `en` base rate there. This
  * suite feeds real sentences in all five supported languages and pins
  * the >= 95% floor the round-6 directive asked for.
  */
class LangIdSpec extends SparkSuite {

  private val labeled: Seq[(String, String)] = Seq(
    "en" -> "the quick brown fox jumps over the lazy dog and runs into the green forest",
    "en" -> "she is reading a long book about the history of science and its many discoveries",
    "en" -> "we went to the market in the morning to buy fresh bread and some fruit",
    "en" -> "this report describes the results of the experiment in great detail",
    "en" -> "it is important to understand how these systems work together",
    "en" -> "the weather was cold and the wind blew strongly over the hills",
    "en" -> "many people believe that learning another language is very useful",
    "en" -> "the children played in the garden until the sun went down",
    "de" -> "der schnelle braune fuchs springt über den faulen hund und läuft in den wald",
    "de" -> "sie liest ein langes buch über die geschichte der wissenschaft und ihre entdeckungen",
    "de" -> "wir gingen am morgen auf den markt um frisches brot und etwas obst zu kaufen",
    "de" -> "dieser bericht beschreibt die ergebnisse des experiments sehr genau",
    "de" -> "es ist wichtig zu verstehen wie diese systeme zusammen arbeiten",
    "de" -> "das wetter war kalt und der wind wehte stark über die hügel",
    "de" -> "viele menschen glauben dass das lernen einer anderen sprache sehr nützlich ist",
    "de" -> "die kinder spielten im garten bis die sonne unterging",
    "fr" -> "le renard brun rapide saute par dessus le chien paresseux et court dans la forêt",
    "fr" -> "elle lit un long livre sur l'histoire de la science et ses nombreuses découvertes",
    "fr" -> "nous sommes allés au marché le matin pour acheter du pain frais et des fruits",
    "fr" -> "ce rapport décrit les résultats de l'expérience avec beaucoup de détails",
    "fr" -> "il est important de comprendre comment ces systèmes fonctionnent ensemble",
    "fr" -> "le temps était froid et le vent soufflait fort sur les collines",
    "fr" -> "beaucoup de gens pensent que l'apprentissage d'une autre langue est très utile",
    "fr" -> "les enfants ont joué dans le jardin jusqu'au coucher du soleil",
    "es" -> "el rápido zorro marrón salta sobre el perro perezoso y corre hacia el bosque",
    "es" -> "ella lee un libro largo sobre la historia de la ciencia y sus muchos descubrimientos",
    "es" -> "fuimos al mercado por la mañana para comprar pan fresco y algo de fruta",
    "es" -> "este informe describe los resultados del experimento con gran detalle",
    "es" -> "es importante entender cómo estos sistemas funcionan juntos",
    "es" -> "el clima era frío y el viento soplaba fuerte sobre las colinas",
    "es" -> "muchas personas creen que aprender otro idioma es muy útil",
    "es" -> "los niños jugaron en el jardín hasta que se puso el sol",
    "zh" -> "敏捷的棕色狐狸跳过了懒惰的狗然后跑进了森林",
    "zh" -> "她正在读一本关于科学历史的长篇书籍",
    "zh" -> "我们早上去市场买新鲜的面包和一些水果",
    "zh" -> "这份报告详细描述了实验的结果")

  test("trigram scorer is >= 95% accurate on real multilingual text") {
    import spark.implicits._
    val df = labeled.toDF("expected", "text")
    val preds = ext.TextAnalysis.langScores(df)
      .select(col("expected"), col("pred")).collect()
    val wrong = preds.filter(r => r.getString(0) != r.getString(1))
    val acc = 1.0 - wrong.length.toDouble / preds.length
    assert(acc >= 0.95,
      s"accuracy $acc; wrong: ${wrong.map(r =>
        s"${r.getString(0)}->${r.getString(1)}").mkString(", ")}")
  }

  test("registered query emits one scored row per document") {
    val out = ext.TextAnalysis.langId(spark, sf)
    assert(out.count() ==
      io.Sources.table(spark, sf, "documents").count())
    // scores are non-negative; pred is one of the five labels
    val r = out.agg(
      min(col("en_n")), min(col("de_n")), min(col("fr_n")),
      min(col("es_n")), min(col("zh_n"))).head()
    (0 until 5).foreach(i => assert(r.getInt(i) >= 0))
    assert(out.filter(!col("pred").isin("en", "de", "fr", "es", "zh"))
      .count() == 0)
  }
}
