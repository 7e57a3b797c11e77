package graft.functions

import org.apache.spark.sql.catalyst.analysis.{UnresolvedExtractValue, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.{CaseWhen, Cast, EqualTo, Expression, In, LambdaFunction, LessThan, Literal, UnresolvedNamedLambdaVariable}
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType, StringType}

import graft.operators.Dedup
import graft.util.Sampling

/** SQL registration for the text/dedup/sampling pipeline kernels (§2.12),
  * so `spark.sql` users reach them without Scala — same FunctionRegistry
  * route as the vector functions in [[GraftFunctions]].
  *
  * The builders return trees of `UnresolvedFunction` over builtin names —
  * exactly the nodes the SQL parser itself emits — and the analyzer's
  * fixpoint resolution takes care of the rest (the Column→Expression
  * bridge is not usable inside registry builders; see GraftFunctions'
  * composite note). Each function mirrors its Column-API twin arithmetic-
  * for-arithmetic, and `PipelineSqlSuite` pins SQL-vs-Column parity per
  * function so the two surfaces cannot drift apart.
  *
  * Scale note: the scalar forms re-derive tokens/shingles inline (codegen
  * does no CSE across HOF lambda boundaries), so `graft_minhash` is the
  * ad-hoc/fixture form — bulk jobs should use the staged
  * [[graft.operators.Dedup.withMinhashSignature]] DataFrame path.
  */
object PipelineSqlFunctions {

  // ------------------------------------------------------------------
  // tiny tree DSL over public Catalyst surface
  // ------------------------------------------------------------------

  private def fn(name: String, args: Expression*): Expression =
    UnresolvedFunction(name, args, isDistinct = false)

  private def L(v: Any): Literal = Literal(v)

  private def asLong(e: Expression): Expression = Cast(e, LongType)
  private def asDouble(e: Expression): Expression = Cast(e, DoubleType)
  private def asString(e: Expression): Expression = Cast(e, StringType)

  private def lam(f: Expression => Expression): Expression = {
    val x = UnresolvedNamedLambdaVariable(Seq("x"))
    LambdaFunction(f(x), Seq(x))
  }

  private def lam2(f: (Expression, Expression) => Expression): Expression = {
    val a = UnresolvedNamedLambdaVariable(Seq("acc"))
    val t = UnresolvedNamedLambdaVariable(Seq("t"))
    LambdaFunction(f(a, t), Seq(a, t))
  }

  private def caseWhen(branches: Seq[(Expression, Expression)], orElse: Expression) =
    CaseWhen(branches, Some(orElse))

  /** Static parameters (shingle n, band counts, split fractions) must be
    * literals — the tree shape depends on them, same constraint as the
    * Column API's plain-Scala parameters. */
  private def foldInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case _ => throw new IllegalArgumentException(
      s"$what must be an integer literal, got ${e.sql}")
  }

  private def foldDouble(e: Expression, what: String): Double = e match {
    // type coercion wraps array literals in casts (array(0.5, 1) widens);
    // the cast target is numeric either way, fold through it
    case c: Cast => foldDouble(c.child, what)
    case Literal(v: Int, IntegerType) => v.toDouble
    case Literal(v: Long, LongType) => v.toDouble
    case Literal(v: Double, DoubleType) => v
    case Literal(v: org.apache.spark.sql.types.Decimal, _: DecimalType) => v.toDouble
    case _ => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got ${e.sql}")
  }

  // ------------------------------------------------------------------
  // text kernels (mirror graft.operators.TextAnalysis)
  // ------------------------------------------------------------------

  /** Explicit whitespace class — same set in Java and RE2 dialects
    * (`\s` diverges on \x0B). Referenced, not copied: one source of
    * truth with the Column-API kernels. */
  private val Ws = graft.operators.TextAnalysis.Ws

  private def tokens(text: Expression): Expression =
    fn("split", fn("lower", fn("trim", text)), L(s"[$Ws]+"))

  /** [[graft.operators.TextAnalysis.segmentUnicode]]'s tree: pad every
    * unsegmented-script codepoint with spaces (Java-dialect class — this
    * expression runs in Spark, not DuckDB). */
  private def segmentUnicode(text: Expression): Expression =
    fn("regexp_replace", text,
      L(graft.operators.TextAnalysis.UnsegRe), L(" $1 "))

  /** [[graft.operators.TextAnalysis.segmentUnicodeBigram]]'s tree: the
    * two-pass run-interior duplicate + pad (X213). */
  private def segmentBigram(text: Expression): Expression = {
    val c = graft.operators.TextAnalysis.UnsegClass
    fn("regexp_replace",
      fn("regexp_replace", text, L(s"(?<=$c)($c)(?=$c)"), L("$1 $1")),
      L(s"($c$c?)"), L(" $1 "))
  }

  /** The `graft_tokens` mode flag: absent/'ws' = whitespace only;
    * 'unicode' = the unsegmented-script per-character fallback;
    * 'bigram' = overlapping character bigrams (X213, the CJKAnalyzer
    * behavior). */
  private def tokensMode(text: Expression, mode: Expression): Expression =
    mode match {
      case Literal(m, StringType) if m != null && m.toString == "unicode" =>
        tokens(segmentUnicode(text))
      case Literal(m, StringType) if m != null && m.toString == "bigram" =>
        tokens(segmentBigram(text))
      case Literal(m, StringType) if m != null && m.toString == "ws" =>
        tokens(text)
      case _ => throw new IllegalArgumentException(
        "graft_tokens mode must be the literal 'ws', 'unicode' or " +
          s"'bigram', got ${mode.sql}")
    }

  private def bpeCount(text: Expression): Expression =
    fn("aggregate", tokens(text), L(0L),
      lam2((acc, t) => fn("+", acc,
        fn("greatest", asLong(fn("ceil", fn("/", fn("length", t), L(4.0)))), L(1L)))))

  private def hitCount(toks: Expression, words: Seq[String]): Expression =
    fn("size", fn("filter", toks, lam(t => In(t, words.map(L(_))))))

  private def langId(text: Expression): Expression = {
    val toks = tokens(text)
    val langs = graft.operators.TextAnalysis.stopwords.keys.toSeq.sorted
    val scored = langs.zipWithIndex.map { case (lang, i) =>
      fn("named_struct",
        L("hits"), hitCount(toks, graft.operators.TextAnalysis.stopwords(lang)),
        L("inv_rank"), L(langs.size - i),
        L("lang"), L(lang))
    }
    val best = fn("array_max", fn("array", scored: _*))
    caseWhen(
      Seq(fn(">", UnresolvedExtractValue(best, L("hits")), L(0)) ->
        UnresolvedExtractValue(best, L("lang"))),
      L("und"))
  }

  /** [[graft.operators.TextAnalysis.langIdScript]]'s tree: the stopword
    * vote, falling back to the script-class vote (kana ⇒ ja, Han ⇒ zh,
    * Thai ⇒ th) when no stopword hits. */
  private def langIdScript(text: Expression): Expression = {
    val classes = graft.operators.TextAnalysis.ScriptClasses.toMap
    def n(re: String) = fn("-", fn("length", text),
      fn("length", fn("regexp_replace", text, L(re), L(""))))
    val byScript = caseWhen(Seq(
      fn(">", n(classes("kana")), L(0)) -> L("ja"),
      fn(">", n(classes("han")), L(0)) -> L("zh"),
      fn(">", n(classes("thai")), L(0)) -> L("th")), L("und"))
    val voted = langId(text)
    caseWhen(Seq(EqualTo(voted, L("und")) -> byScript), voted)
  }

  private val PunctRe = graft.operators.TextAnalysis.PunctRe

  private def qualityScore(text: Expression): Expression = {
    val toks = tokens(text)
    val nTokens = asDouble(fn("size", toks))
    val nChars = asDouble(fn("length", text))
    val stopRatio = fn("/",
      asDouble(hitCount(toks, graft.operators.TextAnalysis.stopwords("en"))),
      fn("greatest", nTokens, L(1.0)))
    val lengthScore = fn("least", fn("/", nTokens, L(64.0)), L(1.0))
    val punct = fn("-", nChars,
      asDouble(fn("length", fn("regexp_replace", text, L(PunctRe), L("")))))
    val punctPenalty = fn("least",
      fn("*", fn("/", punct, fn("greatest", nChars, L(1.0))), L(5.0)), L(1.0))
    fn("round",
      fn("-",
        fn("+",
          fn("*", L(0.5), lengthScore),
          fn("*", L(0.5), fn("least", fn("*", stopRatio, L(5.0)), L(1.0)))),
        fn("*", L(0.25), punctPenalty)),
      L(6))
  }

  private def scrub(text: Expression): Expression =
    fn("trim", fn("regexp_replace",
      fn("regexp_replace",
        fn("regexp_replace", text, L(s"https?://[^$Ws]+"), L(" ")),
        L(s"[^$Ws@]+@[^$Ws@]+\\.[^$Ws@]+"), L(" ")),
      L(s"[$Ws]+"), L(" ")))

  private def normText(text: Expression): Expression =
    fn("regexp_replace", fn("lower", fn("trim", text)), L(s"[$Ws]+"), L(" "))

  private def fingerprint(text: Expression): Expression =
    fn("substring", fn("md5", normText(text)), L(1), L(16))

  private def rollingHash(text: Expression): Expression = {
    val M = 144115188075855859L // largest prime < 2^57 (TextAnalysis.rollingHash)
    fn("aggregate", fn("split", normText(text), L("")), L(0L),
      lam2((acc, ch) => fn("pmod",
        fn("+", fn("*", acc, L(31L)), fn("coalesce", asLong(fn("ascii", ch)), L(0L))),
        L(M))))
  }

  private def shinglesFromTokens(toks: Expression, n: Int): Expression =
    caseWhen(
      Seq(LessThan(fn("size", toks), L(n)) -> fn("array")),
      fn("transform", fn("sequence", L(0), fn("-", fn("size", toks), L(n))),
        lam(i => fn("concat_ws",
          L(" ") +: (0 until n).map(j => fn("element_at", toks, fn("+", i, L(j + 1)))): _*))))

  /** Gopher-gate reason at the default thresholds — the scalar twin of
    * [[graft.operators.Curation.gopherGate]] (NULL = kept). Ad-hoc form:
    * the rule tree re-derives tokens/shingles inline; bulk jobs use the
    * staged DataFrame gate. */
  private def gateReason(text: Expression): Expression = {
    val toks = tokens(text)
    val nt = fn("size", toks)
    // mean chars per WORD (token-length sum / token count) — matches
    // Curation.gopherGate's Gopher-faithful signal, not raw text length
    val atl = fn("/",
      asDouble(fn("aggregate", toks, L(0L), lam2((acc, t) => fn("+", acc, asLong(fn("length", t)))))),
      asDouble(fn("greatest", nt, L(1))))
    val sh = shinglesFromTokens(toks, 3)
    val nsh = fn("size", sh)
    val dupFrac = caseWhen(
      Seq(fn("=", nsh, L(0)) -> L(0.0)),
      fn("/", asDouble(fn("-", nsh, fn("size", fn("array_distinct", sh)))), asDouble(nsh)))
    val sw = fn("size", fn("filter", fn("array_distinct", toks),
      lam(t => In(t, graft.operators.TextAnalysis.stopwords("en").map(L(_))))))
    caseWhen(
      Seq(
        LessThan(nt, L(20)) -> L("too_short"),
        fn(">", nt, L(100000)) -> L("too_long"),
        LessThan(atl, L(3.0)) -> L("word_len_low"),
        fn(">", atl, L(10.0)) -> L("word_len_high"),
        fn(">", dupFrac, L(0.05)) -> L("repetition"),
        LessThan(sw, L(2)) -> L("few_stopwords")),
      Literal.create(null, StringType))
  }

  // ------------------------------------------------------------------
  // dedup kernels (mirror graft.operators.Dedup)
  // ------------------------------------------------------------------

  private def shingleBases(sh: Expression): Expression =
    fn("transform", sh,
      lam(s => asLong(fn("conv", fn("substring", fn("md5", s), L(1), L(7)), L(16), L(10)))))

  private def seedMins(bases: Expression, numHashes: Int): Expression = {
    require(numHashes <= Dedup.MinhashA.length,
      s"numHashes ($numHashes) exceeds the ${Dedup.MinhashA.length} available seeds")
    val mins = (0 until numHashes).map { seed =>
      fn("coalesce",
        fn("array_min", fn("transform", bases,
          lam(h => fn("pmod",
            fn("+", fn("*", L(Dedup.MinhashA(seed)), h), L(Dedup.MinhashB(seed))),
            L(Dedup.MinhashPrime))))),
        L(Dedup.MinhashPrime))
    }
    fn("array", mins: _*)
  }

  private def minhash(text: Expression, shingleN: Int, numHashes: Int): Expression =
    seedMins(shingleBases(shinglesFromTokens(tokens(text), shingleN)), numHashes)

  /** 64-bit simhash over per-token 60-bit md5 hashes — same tree as
    * Dedup.simhash64 (the SimHash64 codegen Expression takes the array). */
  private def simhash64(text: Expression): Expression =
    SimHash64(fn("transform", tokens(text),
      lam(t => asLong(fn("conv", fn("substring", fn("md5", t), L(1), L(15)), L(16), L(10))))))

  private def bandKeys(sig: Expression, numHashes: Int, rowsPerBand: Int): Expression = {
    require(numHashes > 0 && rowsPerBand > 0 && numHashes % rowsPerBand == 0,
      s"numHashes ($numHashes) must be a positive multiple of rowsPerBand ($rowsPerBand)")
    val bands = (0 until numHashes / rowsPerBand).map { b =>
      val slice = (0 until rowsPerBand)
        .map(r => asString(fn("element_at", sig, L(b * rowsPerBand + r + 1))))
      fn("concat", L(s"$b:"), fn("md5", fn("concat_ws", L("|") +: slice: _*)))
    }
    fn("array", bands: _*)
  }

  // ------------------------------------------------------------------
  // classifier kernels (mirror graft.operators.Curation X151/X158)
  // ------------------------------------------------------------------

  /** Hashed bag-of-words bitmask — the scalar twin of
    * [[graft.operators.Curation.featureMask]] (28-bit md5 bucket,
    * order-free bit-OR fold). */
  private def featureMaskSql(text: Expression, dims: Int): Expression = {
    require(dims >= 1 && dims <= 60,
      s"dims must be in [1,60] (bitmask packs into one Long), got $dims")
    fn("coalesce",
      fn("aggregate", tokens(text), L(0L),
        lam2((acc, t) => fn("|", acc, fn("shiftleft", L(1L),
          Cast(fn("%",
            asLong(fn("conv", fn("substring", fn("md5", t), L(1), L(7)), L(16), L(10))),
            L(dims.toLong)), IntegerType))))),
      L(0L))
  }

  /** Frozen-model logistic probability — the scalar twin of
    * [[graft.operators.Curation.lrProb]]: the identical left-assoc logit
    * chain over literal weights, so a SQL user scores with a trained
    * model ([[graft.operators.Curation.lrTrain]]) bit-for-bit. */
  private def lrProbSql(mask: Expression, weights: Seq[Double],
      bias: Double): Expression = {
    require(weights.nonEmpty && weights.size <= 60,
      s"weights size must be in [1,60], got ${weights.size}")
    val z = weights.indices.foldLeft[Expression](L(bias)) { (acc, j) =>
      fn("+", acc, caseWhen(Seq(
        EqualTo(fn("&", fn("shiftright", mask, L(j)), L(1L)), L(1L))
          -> L(weights(j))), L(0.0)))
    }
    fn("/", L(1.0), fn("+", L(1.0), fn("exp", fn("negative", z))))
  }

  private def foldDoubleSeq(e: Expression, what: String): Seq[Double] = e match {
    // the analyzer resolves the INNER array(...) call bottom-up before our
    // builder runs, so the argument usually arrives as CreateArray already
    case ca: org.apache.spark.sql.catalyst.expressions.CreateArray =>
      ca.children.map(foldDouble(_, what))
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if f.nameParts.lastOption.exists(_.equalsIgnoreCase("array")) =>
      f.arguments.map(foldDouble(_, what))
    case _ => throw new IllegalArgumentException(
      s"$what must be an array(...) of numeric literals, got ${e.sql}")
  }

  // ------------------------------------------------------------------
  // sampling kernels (mirror graft.util.Sampling)
  // ------------------------------------------------------------------

  private def hashBucket(key: Expression, salt: Expression): Expression =
    fn("pmod",
      asLong(fn("conv",
        fn("substring",
          fn("md5", fn("concat", salt, fn("coalesce", asString(key), L("")))),
          L(1), L(7)),
        L(16), L(10))),
      L(Sampling.Buckets))

  private def hashSplit(key: Expression, trainFrac: Double, valFrac: Double,
      salt: Expression): Expression = {
    require(trainFrac > 0.0 && valFrac > 0.0 && trainFrac + valFrac < 1.0,
      s"need train, val > 0 and train + val < 1; got ($trainFrac, $valFrac)")
    val bucket = hashBucket(key, salt)
    val c1 = math.round(trainFrac * Sampling.Buckets)
    val c2 = c1 + math.round(valFrac * Sampling.Buckets)
    caseWhen(
      Seq(LessThan(bucket, L(c1)) -> L("train"), LessThan(bucket, L(c2)) -> L("val")),
      L("test"))
  }

  /** [[graft.operators.Curation.prioritySample]]'s key: priority = w /
    * md5-dyadic-uniform — two IEEE divisions, no transcendental. ORDER BY
    * graft_priority(id, w, 'seed') DESC LIMIT k = weight-proportional
    * sampling without replacement in pure SQL. */
  private def priorityKey(id: Expression, w: Expression, seed: Expression): Expression = {
    val h = asLong(fn("conv",
      fn("substring",
        fn("md5", fn("concat", asString(id), L(":"), asString(seed))),
        L(1), L(13)),
      L(16), L(10)))
    fn("/", asDouble(w),
      fn("/", fn("+", asDouble(h), L(1.0)), L(4503599627370496.0)))
  }

  // ------------------------------------------------------------------
  // registry table — consumed by GraftFunctions.register / GraftExtensions
  // ------------------------------------------------------------------

  private def arity(name: String, ns: Int*): Nothing =
    throw new IllegalArgumentException(
      s"$name expects ${ns.mkString(" or ")} argument(s)")

  /** Wrong argument counts must surface as the clean arity message, not an
    * IndexOutOfBounds from inside the builder. */
  private def fixed(name: String, n: Int)(
      b: Seq[Expression] => Expression): (String, Seq[Expression] => Expression) =
    name -> (args => if (args.length == n) b(args) else arity(name, n))

  private[functions] def fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_tokens" -> {
      case Seq(text) => tokens(text)
      case Seq(text, mode) => tokensMode(text, mode)
      case _ => arity("graft_tokens", 1, 2)
    },
    fixed("graft_segment_unicode", 1)(a => segmentUnicode(a.head)),
    fixed("graft_segment_bigram", 1)(a => segmentBigram(a.head)),
    fixed("graft_bpe_count", 1)(a => bpeCount(a.head)),
    fixed("graft_lang_id", 1)(a => langId(a.head)),
    fixed("graft_script_lang_id", 1)(a => langIdScript(a.head)),
    fixed("graft_quality_score", 1)(a => qualityScore(a.head)),
    fixed("graft_gate_reason", 1)(a => gateReason(a.head)),
    fixed("graft_scrub", 1)(a => scrub(a.head)),
    fixed("graft_fingerprint", 1)(a => fingerprint(a.head)),
    fixed("graft_rolling_hash", 1)(a => rollingHash(a.head)),
    fixed("graft_shingles", 2)(a =>
      shinglesFromTokens(tokens(a.head), foldInt(a(1), "shingle n"))),
    fixed("graft_simhash", 1)(a => simhash64(a.head)),
    fixed("graft_minhash", 3)(a =>
      minhash(a.head, foldInt(a(1), "shingle n"), foldInt(a(2), "numHashes"))),
    fixed("graft_band_keys", 3)(a =>
      bandKeys(a.head, foldInt(a(1), "numHashes"), foldInt(a(2), "rowsPerBand"))),
    "graft_hash_bucket" -> {
      case Seq(key) => hashBucket(key, L(""))
      case Seq(key, salt) => hashBucket(key, salt)
      case _ => arity("graft_hash_bucket", 1, 2)
    },
    "graft_hash_split" -> {
      case Seq(key, tr, va) =>
        hashSplit(key, foldDouble(tr, "train fraction"), foldDouble(va, "val fraction"), L(""))
      case Seq(key, tr, va, salt) =>
        hashSplit(key, foldDouble(tr, "train fraction"), foldDouble(va, "val fraction"), salt)
      case _ => arity("graft_hash_split", 3, 4)
    },
    fixed("graft_priority", 3)(a => priorityKey(a.head, a(1), a(2))),
    fixed("graft_cdc_cut", 2)(a => cdcCut(a.head, foldInt(a(1), "divisor"))),
    fixed("graft_feature_mask", 2)(a =>
      featureMaskSql(a.head, foldInt(a(1), "dims"))),
    fixed("graft_lr_prob", 3)(a => lrProbSql(a.head,
      foldDoubleSeq(a(1), "weights"), foldDouble(a(2), "bias"))),
    fixed("graft_jl_sign", 3)(a => jlSignSql(a.head, a(1), a(2))))

  /** CDC boundary rule (the [[graft.operators.TextAnalysis.cdcChunks]]
    * cut): true iff the token's 28-bit md5 base ≡ 0 (mod divisor). SQL
    * users chunk with the exact same boundaries as the bulk operator. */
  private def cdcCut(term: Expression, divisor: Int): Expression = {
    require(divisor >= 2, s"divisor must be >= 2, got $divisor")
    val base = asLong(fn("conv", fn("substring", fn("md5", term), L(1), L(7)), L(16), L(10)))
    fn("=", fn("pmod", base, L(divisor.toLong)), L(0L))
  }

  /** ±1.0 from md5(seed:j:i) parity — the [[graft.operators.Ann
    * .jlProject]] matrix entry, regenerable from SQL. */
  private def jlSignSql(seed: Expression, j: Expression, i: Expression): Expression = {
    val s = fn("concat_ws", L(":"), seed, asString(j), asString(i))
    val base = asLong(fn("conv", fn("substring", fn("md5", s), L(1), L(7)), L(16), L(10)))
    caseWhen(Seq(fn("=", fn("pmod", base, L(2L)), L(0L)) -> L(1.0)), L(-1.0))
  }
}
