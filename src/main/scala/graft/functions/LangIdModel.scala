package graft.functions

/** Character-bigram naive-Bayes language-ID model (the Cavnar–Trenkle
  * 1994 / Dunning 1994 char-n-gram family), trained at CLASS-LOAD time
  * in plain Scala over a seeded multilingual fixture — no runtime
  * dependency, no shipped binary, and (the property the oracle gate
  * needs) the finished model is a TABLE OF INTEGER LITERALS both
  * engines consume verbatim, so scoring is exact BIGINT addition with
  * no cross-engine float drift anywhere.
  *
  * Features: overlapping char bigrams of `' ' + lower(text) + ' '`.
  * Vocabulary: the union of each language's `TopPerLang` most frequent
  * training bigrams (count desc, bigram asc — deterministic). Weights:
  * Laplace-smoothed log-likelihoods `ln((c(g,l)+1)/(T_l+V+1))` scaled
  * by 2^20 and rounded to integers; bigrams outside the vocabulary
  * score the per-language OOV weight `ln(1/(T_l+V+1))`. Uniform prior
  * (the fixture is balanced), argmax ties break lexicographically.
  *
  * The fixture is split into TRAIN (builds the model) and HELD-OUT
  * (never trained on — the honest evaluation set behind
  * `text_langid_fixture_confusion`). Both are ordinary multilingual
  * sentences authored for this repo; apostrophes are avoided so the
  * held-out rows can ride verbatim inside oracle SQL string literals.
  */
object LangIdModel {

  val Langs: Seq[String] = Seq("de", "en", "es", "fr", "zh")

  /** ln-likelihood scale: integer weight = round(ln(p) · 2^20). */
  val Scale: Double = 1048576.0

  /** Vocabulary cap per language (feature selection, count desc). */
  val TopPerLang: Int = 128

  val Train: Seq[(String, String)] = Seq(
    "en" -> "the quick brown fox jumps over the lazy dog",
    "en" -> "she walked to the market and bought some fresh bread",
    "en" -> "it was a cold morning and the streets were quiet",
    "en" -> "they have been working on this project for three years",
    "en" -> "the weather today is much better than it was yesterday",
    "en" -> "he could not remember where he had left his keys",
    "en" -> "many people enjoy reading books during the long winter evenings",
    "en" -> "the children played in the garden until the sun went down",
    "en" -> "this is one of the best restaurants in the whole city",
    "en" -> "we should meet again next week to discuss the results",
    "de" -> "der schnelle braune fuchs springt über den faulen hund",
    "de" -> "sie ging zum markt und kaufte frisches brot",
    "de" -> "es war ein kalter morgen und die straßen waren leise",
    "de" -> "sie arbeiten seit drei jahren an diesem projekt",
    "de" -> "das wetter ist heute viel besser als gestern",
    "de" -> "er konnte sich nicht erinnern wo er seine schlüssel gelassen hatte",
    "de" -> "viele menschen lesen gerne bücher an langen winterabenden",
    "de" -> "die kinder spielten im garten bis die sonne unterging",
    "de" -> "das ist eines der besten restaurants in der ganzen stadt",
    "de" -> "wir sollten uns nächste woche wieder treffen um die ergebnisse zu besprechen",
    "es" -> "el rápido zorro marrón salta sobre el perro perezoso",
    "es" -> "ella fue al mercado y compró pan fresco",
    "es" -> "era una mañana fría y las calles estaban tranquilas",
    "es" -> "han trabajado en este proyecto durante tres años",
    "es" -> "el tiempo de hoy es mucho mejor que el de ayer",
    "es" -> "no podía recordar dónde había dejado sus llaves",
    "es" -> "muchas personas disfrutan leyendo libros en las largas tardes de invierno",
    "es" -> "los niños jugaron en el jardín hasta que se puso el sol",
    "es" -> "este es uno de los mejores restaurantes de toda la ciudad",
    "es" -> "deberíamos reunirnos otra vez la próxima semana para hablar de los resultados",
    "fr" -> "le rapide renard brun saute par dessus le chien paresseux",
    "fr" -> "elle est allée au marché et a acheté du pain frais",
    "fr" -> "le matin était froid et les rues étaient calmes",
    "fr" -> "ils travaillent sur ce projet depuis trois ans",
    "fr" -> "le temps est bien meilleur que celui de hier",
    "fr" -> "il ne pouvait pas se rappeler où il avait laissé ses clés",
    "fr" -> "beaucoup de gens aiment lire des livres pendant les longues soirées",
    "fr" -> "les enfants ont joué dans le jardin avant le coucher du soleil",
    "fr" -> "ce restaurant est un des meilleurs de toute la ville",
    "fr" -> "nous devrions nous retrouver la semaine prochaine pour discuter des résultats",
    "zh" -> "敏捷的棕色狐狸跳过了懒惰的狗",
    "zh" -> "她去市场买了新鲜的面包",
    "zh" -> "那是一个寒冷的早晨街道很安静",
    "zh" -> "他们在这个项目上工作了三年",
    "zh" -> "今天的天气比昨天好多了",
    "zh" -> "他想不起来把钥匙放在哪里了",
    "zh" -> "很多人喜欢在漫长的冬夜读书",
    "zh" -> "孩子们在花园里玩到太阳下山",
    "zh" -> "这是全城最好的餐馆之一",
    "zh" -> "我们下周应该再见面讨论结果")

  /** Never trained on — the evaluation split. */
  val HeldOut: Seq[(String, String)] = Seq(
    "en" -> "the train arrived at the station ten minutes late",
    "en" -> "a small bird was singing outside the kitchen window",
    "en" -> "everyone agreed that the plan needed more careful thought",
    "en" -> "she opened the old wooden door very slowly",
    "en" -> "there was nothing left in the cupboard except a jar of honey",
    "de" -> "der zug kam zehn minuten zu spät am bahnhof an",
    "de" -> "ein kleiner vogel sang vor dem küchenfenster",
    "de" -> "alle waren sich einig dass der plan mehr überlegung brauchte",
    "de" -> "sie öffnete die alte holztür sehr langsam",
    "de" -> "im schrank war nichts mehr außer einem glas honig",
    "es" -> "el tren llegó a la estación con diez minutos de retraso",
    "es" -> "un pequeño pájaro cantaba fuera de la ventana de la cocina",
    "es" -> "todos estuvieron de acuerdo en que el plan necesitaba más reflexión",
    "es" -> "ella abrió la vieja puerta de madera muy despacio",
    "es" -> "no quedaba nada en el armario excepto un tarro de miel",
    "fr" -> "le train est arrivé à la gare avec dix minutes de retard",
    "fr" -> "un petit oiseau chantait devant la fenêtre de la cuisine",
    "fr" -> "tout le monde était du même avis sur le nouveau plan",
    "fr" -> "elle a ouvert la vieille porte en bois très lentement",
    "fr" -> "il ne restait rien dans le placard sauf un pot de miel",
    "zh" -> "火车晚点十分钟到达车站",
    "zh" -> "一只小鸟在厨房窗外唱歌",
    "zh" -> "大家都同意这个计划需要更多考虑",
    "zh" -> "她慢慢地打开了那扇旧木门",
    "zh" -> "柜子里除了一罐蜂蜜什么都没有了")

  /** Overlapping char bigrams of the padded, lowercased text — the
    * EXACT feature rule both engines apply at scoring time.
    */
  def bigrams(s: String): Seq[String] = {
    val p = " " + s.toLowerCase + " "
    (0 until p.length - 1).map(i => p.substring(i, i + 2))
  }

  /** (vocab rows, OOV weights): `vocab` is (bigram, per-lang weight in
    * [[Langs]] order) sorted by bigram; `oov` is the per-lang weight of
    * any bigram outside the vocabulary. Pure function of [[Train]].
    */
  lazy val (vocab, oov): (Seq[(String, Seq[Long])], Seq[Long]) = {
    val byLang: Map[String, Seq[String]] = Train.groupBy(_._1)
      .map { case (l, rows) => l -> rows.flatMap(r => bigrams(r._2)) }
    val counts: Map[String, Map[String, Long]] =
      byLang.map { case (l, gs) =>
        l -> gs.groupBy(identity).map { case (g, o) => g -> o.size.toLong }
      }
    val selected: Seq[String] = Langs.flatMap { l =>
      counts(l).toSeq.sortBy { case (g, c) => (-c, g) }.take(TopPerLang)
        .map(_._1)
    }.distinct.sorted
    val v = selected.size + 1 // +1: the OOV bucket
    val totals: Map[String, Long] = byLang.map { case (l, gs) =>
      l -> gs.size.toLong
    }
    def w(num: Double, l: String): Long =
      math.round(math.log(num / (totals(l) + v).toDouble) * Scale)
    val rows = selected.map { g =>
      g -> Langs.map(l => w(counts(l).getOrElse(g, 0L) + 1.0, l))
    }
    val oovW = Langs.map(l => w(1.0, l))
    (rows, oovW)
  }
}
