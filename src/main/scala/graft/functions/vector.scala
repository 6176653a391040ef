package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.Murmur3

/** Static kernels for the vector/text expressions below. Kept as plain
  * static methods so whole-stage-generated code can call them without
  * closure objects (same pattern as [[graft.core.BloomFilter]]'s kernels).
  */
object VectorKernels {

  /** Cosine similarity of two equal-length float vectors, accumulated in
    * double in index order (one pass, three accumulators). The DuckDB
    * oracle mirrors this exact association:
    * `dot / (sqrt(na) * sqrt(nb))`. Zero-norm input → 0.0. */
  def cosineFloat(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"cosine_sim: length mismatch ${n} vs ${b.numElements()}")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      requireNoNullSlot(a, i, "cosine_sim"); requireNoNullSlot(b, i, "cosine_sim")
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosineDouble(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"cosine_sim: length mismatch ${n} vs ${b.numElements()}")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      requireNoNullSlot(a, i, "cosine_sim"); requireNoNullSlot(b, i, "cosine_sim")
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Inner product of two equal-length vectors, accumulated in double in
    * index order — the ADC building block for product-quantized scoring
    * (and the norm via `dot(x, x)`). DuckDB twin: `list_dot_product`. */
  // Null-slot contract (cosine/dot/vecSub kernels): a NULL array element
  // is rejected with a clear error rather than silently read as 0/garbage
  // through getFloat/getDouble — embeddings come from parquet whose list
  // type is nullable-by-default (containsNull=true), so the type check
  // can't forbid them statically without breaking every real caller.
  // Deliberate divergence from the DuckDB twins (which yield SQL NULL for
  // a null slot): a null embedding slot upstream of similarity scoring is
  // corrupt input, and at corpus scale a loud per-row failure is worth
  // more than a silently-NULL score that drops the row from a top-k — a
  // pipeline that wants row-level degradation should filter
  // `!array_contains(..., NULL)` ahead of the kernel, which keeps the
  // policy in the query where it's visible.
  private def requireNoNullSlot(a: ArrayData, i: Int, op: String): Unit =
    if (a.isNullAt(i)) throw new IllegalArgumentException(
      s"$op: NULL element at index $i — vector columns must have non-null elements")

  def dotFloat(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"dot_product: length mismatch ${n} vs ${b.numElements()}")
    var dot = 0.0
    var i = 0
    while (i < n) {
      requireNoNullSlot(a, i, "dot_product"); requireNoNullSlot(b, i, "dot_product")
      dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  def dotDouble(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"dot_product: length mismatch ${n} vs ${b.numElements()}")
    var dot = 0.0
    var i = 0
    while (i < n) {
      requireNoNullSlot(a, i, "dot_product"); requireNoNullSlot(b, i, "dot_product")
      dot += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    dot
  }

  /** PQ encode kernel (see [[PqEncode]]): per subspace `j`, the code of
    * the max-cosine centroid (ties -> lowest code, matching
    * `max_by(code, struct(sim, -code))`). `cb` is the flat codebook laid
    * out `(j*ksub + code)*sd + dim`. One call encodes a full vector —
    * the FAISS-style tight loop, no explode/join/aggregate. */
  def pqEncode(vec: ArrayData, cb: ArrayData, m: Int, ksub: Int): ArrayData = {
    val d = vec.numElements()
    require(d % m == 0, s"pq_encode: m ($m) must divide dims ($d)")
    val sd = d / m
    require(cb.numElements() == m * ksub * sd,
      s"pq_encode: codebook length ${cb.numElements()} != m*ksub*sd (${m * ksub * sd})")
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestCos = Double.NegativeInfinity
      var code = 0
      while (code < ksub) {
        val base = (j * ksub + code) * sd
        var dot = 0.0; var na = 0.0; var nc = 0.0
        var i = 0
        while (i < sd) {
          val x = vec.getDouble(j * sd + i)
          val c = cb.getDouble(base + i)
          dot += x * c; na += x * x; nc += c * c
          i += 1
        }
        val cos = if (na == 0.0 || nc == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nc))
        if (cos > bestCos) { bestCos = cos; best = code }
        code += 1
      }
      out(j) = best
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** PQ ADC-table kernel (see [[PqTable]]): the query's flat lookup table
    * `table[j*ksub + code] = dot(q_j, c_{j,code})`, one call per query. */
  def pqTable(vec: ArrayData, cb: ArrayData, m: Int, ksub: Int): ArrayData = {
    val d = vec.numElements()
    require(d % m == 0, s"pq_table: m ($m) must divide dims ($d)")
    val sd = d / m
    require(cb.numElements() == m * ksub * sd,
      s"pq_table: codebook length ${cb.numElements()} != m*ksub*sd (${m * ksub * sd})")
    val out = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      var code = 0
      while (code < ksub) {
        val base = (j * ksub + code) * sd
        var dot = 0.0
        var i = 0
        while (i < sd) {
          dot += vec.getDouble(j * sd + i) * cb.getDouble(base + i)
          i += 1
        }
        out(j * ksub + code) = dot
        code += 1
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** ADC lookup kernel (see [[PqAdc]]): `Σ_j table[j*ksub + codes[j]]` —
    * the product-quantization score is `m` flat-array lookups, never a
    * full-width vector pass. */
  def pqAdc(table: ArrayData, codes: ArrayData, ksub: Int): Double = {
    val m = codes.numElements()
    val tlen = table.numElements()
    var sum = 0.0
    var j = 0
    while (j < m) {
      val code = codes.getInt(j)
      // per-code bound, not just the flattened index: a code >= ksub at a
      // non-final subspace would land inside ANOTHER subspace's slots and
      // return a silently wrong score instead of failing
      require(code >= 0 && code < ksub,
        s"pq_adc: code $code at subspace $j out of range [0, $ksub)")
      val idx = j * ksub + code
      require(idx < tlen,
        s"pq_adc: slot $idx at subspace $j out of table range $tlen (ksub=$ksub)")
      sum += table.getDouble(idx)
      j += 1
    }
    sum
  }

  /** Element-wise vector subtraction (see [[VecSub]]): the residual
    * kernel of residual-encoded IVF×PQ. Accepts float or double element
    * arrays on either side; always returns doubles. */
  def vecSub(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): ArrayData = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"vec_sub: length mismatch ${n} vs ${b.numElements()}")
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      requireNoNullSlot(a, i, "vec_sub"); requireNoNullSlot(b, i, "vec_sub")
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      out(i) = x - y
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Int8-quantization audit kernel (see [[Int8QuantStats]]):
    * `[scale, max_abs_err]` for a float/double vector under symmetric
    * per-vector int8 quantization (`scale = max|e|/127`, code =
    * `clamp(floor(e/scale + 0.5), ±127)`). Operation order mirrors the
    * SQL twin exactly (cast → abs-max → divide → round-half-up → clamp →
    * reconstruct), so the audit values match the oracle bit for bit.
    * Zero vector → scale 0, err 0. */
  def int8QuantStats(a: ArrayData, isFloat: Boolean): ArrayData = {
    val n = a.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      requireNoNullSlot(a, i, "int8_quant_stats")
      val e = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val ab = math.abs(e)
      // NaN sorts greatest in Spark's array_max — propagate it the same
      // way so the composed-form equivalence holds on NaN slots too
      if (ab.isNaN || ab > maxAbs) maxAbs = ab
      i += 1
    }
    val s = maxAbs / 127.0
    var maxErr = 0.0
    if (s != 0.0) {
      i = 0
      while (i < n) {
        val e = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        var q = math.floor(e / s + 0.5)
        if (q > 127.0) q = 127.0
        if (q < -127.0) q = -127.0
        val err = math.abs(e - q * s)
        if (err.isNaN || err > maxErr) maxErr = err
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array(s, maxErr))
  }

  /** SQ8 encode kernel (see [[Sq8Encode]]): symmetric per-vector int8
    * quantization into ONE self-contained binary — 8 bytes of big-endian
    * IEEE-754 scale (`max|e|/127`), then one signed code byte per
    * dimension (`clamp(floor(e/scale + 0.5), ±127)`; zero vector →
    * scale 0, all-zero codes). Identical arithmetic to
    * [[int8QuantStats]], so the audit query's error bounds govern this
    * container too. The 4× wire/storage compression every 100 TB vector
    * corpus applies, as a column a shuffle can carry. */
  def sq8Encode(a: ArrayData, isFloat: Boolean): Array[Byte] = {
    val n = a.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      requireNoNullSlot(a, i, "sq8_encode")
      val e = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val ab = math.abs(e)
      if (ab.isNaN || ab > maxAbs) maxAbs = ab
      i += 1
    }
    val s = maxAbs / 127.0
    val out = new Array[Byte](8 + n)
    val bits = java.lang.Double.doubleToLongBits(s)
    var j = 0
    while (j < 8) { out(j) = ((bits >>> (56 - 8 * j)) & 0xffL).toByte; j += 1 }
    if (s != 0.0) {
      i = 0
      while (i < n) {
        val e = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        var q = math.floor(e / s + 0.5)
        if (q > 127.0) q = 127.0
        if (q < -127.0) q = -127.0
        out(8 + i) = q.toByte
        i += 1
      }
    }
    out
  }

  /** Asymmetric SQ8 cosine (see [[Sq8Cos]]): cosine between a full-width
    * query vector and an [[sq8Encode]]d corpus vector — the ADC-style
    * scoring pass of the IVF×SQ8 lane. The per-vector scale is a positive
    * scalar multiplier and cancels in cosine, so the corpus side is pure
    * integer code math (the scale bytes exist for dot/L2 consumers);
    * zero-norm convention matches [[cosineDouble]]. */
  def sq8Cos(q: ArrayData, isFloat: Boolean, bin: Array[Byte]): Double = {
    val n = bin.length - 8
    require(q.numElements() == n,
      s"sq8_cos: length mismatch ${q.numElements()} vs $n")
    var dot = 0.0; var nq = 0.0; var nc = 0L
    var i = 0
    while (i < n) {
      requireNoNullSlot(q, i, "sq8_cos")
      val x = if (isFloat) q.getFloat(i).toDouble else q.getDouble(i)
      val c = bin(8 + i).toInt
      dot += x * c; nq += x * x; nc += c.toLong * c
      i += 1
    }
    if (nq == 0.0 || nc == 0L) 0.0
    else dot / (math.sqrt(nq) * math.sqrt(nc.toDouble))
  }

  /** Bigram-repetition kernel (see [[BigramStats]]): `[top, total]` where
    * `total` is the number of adjacent token bigrams (`|tokens| - 1`) and
    * `top` the occurrence count of the most frequent one. One local pass
    * with a per-document hash map (bounded by tokens-per-doc, never by
    * corpus) — replaces explode + two aggregate levels with a narrow
    * projection: zero shuffles, and unlike the `aggregate()` higher-order
    * fold it stays out of interpreted-lambda land. Exact: keys are the
    * token pair itself, not a hash. Requires ≥ 2 tokens (callers filter;
    * defensive `[0, 0]` otherwise). */
  def bigramStats(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n < 2) {
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array[Long](0L, 0L))
    }
    def tok(i: Int): UTF8String =
      if (tokens.isNullAt(i)) UTF8String.EMPTY_UTF8 else tokens.getUTF8String(i)
    val counts = new java.util.HashMap[(UTF8String, UTF8String), Long]()
    var top = 0L
    var i = 0
    while (i < n - 1) {
      val key = (tok(i), tok(i + 1))
      val c = counts.merge(key, 1L, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array[Long](top, n - 1L))
  }

  /** Word n-gram kernel (see [[WordNgrams]]). Null tokens render as empty
    * strings inside a shingle (they cannot occur from the tokenizer). */
  def wordNgrams(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    def str(i: Int): UTF8String =
      if (tokens.isNullAt(i)) UTF8String.EMPTY_UTF8 else tokens.getUTF8String(i)
    val sep = UTF8String.fromString(" ")
    if (len < n) {
      val whole = UTF8String.concatWs(sep, Array.tabulate(len)(str): _*)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(Array[Any](whole))
    } else {
      val out = new Array[Any](len - n + 1)
      var i = 0
      while (i <= len - n) {
        out(i) = UTF8String.concatWs(sep, Array.tabulate(n)(j => str(i + j)): _*)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  private def isTokenByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  /** The four stopword profiles of the language-ID heuristic — canonical
    * definition (the operators layer and every SQL twin alias these).
    * All pure-ASCII lowercase, so byte comparison == string comparison. */
  val stopEn: Seq[String] = Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "for")
  val stopDe: Seq[String] = Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu", "den")
  val stopFr: Seq[String] = Seq("le", "la", "et", "les", "des", "est", "pas", "une", "dans", "que")
  val stopEs: Seq[String] = Seq("el", "los", "de", "que", "y", "en", "un", "es", "una", "por")

  private val stopProfiles: Array[Array[Array[Byte]]] =
    Array(stopEn, stopDe, stopFr, stopEs)
      .map(_.map(_.getBytes("UTF-8")).toArray)

  /** Stop-profile counting kernel (see [[StopProfileCounts]]): per
    * profile, how many token occurrences are one of its stopwords —
    * `[en, de, fr, es]` in ONE pass over the lowered bytes (the composed
    * form pays one interpreted `filter` lambda per profile per token).
    * A token is compared only against same-length words. */
  def stopProfileCounts(text: UTF8String): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val n = bytes.length
    val counts = new Array[Int](4)
    var i = 0
    while (i < n) {
      if (isTokenByte(bytes(i))) {
        val start = i
        while (i < n && isTokenByte(bytes(i))) i += 1
        val len = i - start
        var p = 0
        while (p < 4) {
          val words = stopProfiles(p)
          var w = 0
          var hit = false
          while (w < words.length && !hit) {
            val word = words(w)
            if (word.length == len) {
              var j = 0
              while (j < len && word(j) == bytes(start + j)) j += 1
              hit = j == len
            }
            w += 1
          }
          if (hit) counts(p) += 1
          p += 1
        }
      } else i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(counts)
  }

  /** N-gram counting kernel (see [[WordNgramStats]]): `[total, distinct]`
    * word `n`-gram shingle counts of a token array WITHOUT materializing
    * the shingle array (the `word_ngrams` → `array_distinct` → `size`
    * composition allocates every shingle string twice). Same semantics as
    * [[wordNgrams]]: inputs shorter than `n` yield one whole-text shingle.
    * Distinctness is decided on the actual shingle strings (a per-doc
    * bounded set) — exact, not hash-approximate. */
  def wordNgramStats(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    val total = math.max(len - n + 1, 1).toLong
    val seen = new java.util.HashSet[UTF8String]()
    val sep = UTF8String.fromString(" ")
    // same null-slot rule as wordNgrams (null renders as empty string) so
    // the two kernels agree on every legal input, not just null-free ones
    def str(i: Int): UTF8String =
      if (tokens.isNullAt(i)) UTF8String.EMPTY_UTF8 else tokens.getUTF8String(i)
    if (len < n) {
      // mirror wordNgrams' short-input fallback: one shingle of all tokens
      seen.add(UTF8String.concatWs(sep, Array.tabulate(len)(str): _*))
    } else {
      var i = 0
      while (i <= len - n) {
        seen.add(UTF8String.concatWs(sep, Array.tabulate(n)(j => str(i + j)): _*))
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      Array(total, seen.size.toLong))
  }

  /** Gopher-rule token statistics kernel (see [[GopherTokenStats]]):
    * `[n_words, tok_chars, n_alpha_words, n_stop_distinct]` in one pass
    * over the lowered bytes — word count, total token characters, tokens
    * containing at least one letter, and DISTINCT English stopwords
    * present (a 10-bit mask over [[stopEn]]). The composed form pays an
    * interpreted `rlike` lambda per token for the alpha-word count. */
  def gopherTokenStats(text: UTF8String): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val n = bytes.length
    val en = stopProfiles(0)
    var nWords = 0L
    var tokChars = 0L
    var nAlpha = 0L
    var stopMask = 0
    var i = 0
    while (i < n) {
      if (isTokenByte(bytes(i))) {
        val start = i
        var hasAlpha = false
        while (i < n && isTokenByte(bytes(i))) {
          if (bytes(i) >= 'a' && bytes(i) <= 'z') hasAlpha = true
          i += 1
        }
        val len = i - start
        nWords += 1
        tokChars += len
        if (hasAlpha) nAlpha += 1
        var w = 0
        while (w < en.length) {
          if ((stopMask & (1 << w)) == 0 && en(w).length == len) {
            var j = 0
            while (j < len && en(w)(j) == bytes(start + j)) j += 1
            if (j == len) stopMask |= 1 << w
          }
          w += 1
        }
      } else i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      Array(nWords, tokChars, nAlpha, java.lang.Long.bitCount(stopMask.toLong).toLong))
  }

  /** Hashed-feature linear scorer kernel (see [[HashedLrScore]]): one pass
    * over the lowered bytes; every `[a-z0-9]+` run contributes
    * `weight(bucket(run))` where `bucket = (len*31 + firstByte) % dim` and
    * `weight(b) = (b * 2654435761) % 1001 - 500`. All-integer arithmetic,
    * so a SQL engine computes the identical score from the identical
    * tokens; token runs are bucketed without ever materializing a token
    * array. Tokens are pure ASCII runs, so byte length == char length and
    * the first byte == `ascii(token)`. */
  def hashedLrScore(text: UTF8String, dim: Int): Long = {
    val bytes = text.toLowerCase.getBytes
    val n = bytes.length
    var score = 0L
    var i = 0
    while (i < n) {
      if (isTokenByte(bytes(i))) {
        val first = bytes(i).toLong
        val start = i
        while (i < n && isTokenByte(bytes(i))) i += 1
        val bucket = ((i - start) * 31L + first) % dim
        score += (bucket * 2654435761L) % 1001L - 500L
      } else i += 1
    }
    score
  }

  /** Tokenizer kernel (see [[WordTokens]]): lowercase, then maximal
    * `[a-z0-9]+` byte runs. Byte-for-byte equal to
    * `regexp_extract_all(lower(text), '[a-z0-9]+', 0)` for EVERY input:
    * the lowering is the same `UTF8String.toLowerCase` the built-in
    * `lower` uses, and scanning the lowered UTF-8 bytes is exact because
    * multi-byte code points never contain ASCII-range bytes. */
  def wordTokens(text: UTF8String): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val n = bytes.length
    var count = 0
    var i = 0
    while (i < n) { // first pass: count runs (no buffer growth/copies)
      if (isTokenByte(bytes(i))) {
        count += 1
        while (i < n && isTokenByte(bytes(i))) i += 1
      } else i += 1
    }
    val out = new Array[Any](count)
    var t = 0
    i = 0
    while (i < n) {
      if (isTokenByte(bytes(i))) {
        val start = i
        while (i < n && isTokenByte(bytes(i))) i += 1
        out(t) = UTF8String.fromBytes(bytes, start, i - start)
        t += 1
      } else i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Element-wise seeded murmur3 (see [[HashArray]]); nulls hash as empty. */
  def hashArray(arr: ArrayData, seed: Int): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val bytes =
        if (arr.isNullAt(i)) Array.emptyByteArray else arr.getUTF8String(i).getBytes
      out(i) = Murmur3.hashBytes(bytes, seed)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** MinHash signature kernel: one murmur3 per (shingle, seed), min-folded
    * in place; returns a primitive int array (no boxing on either path).
    * Null shingles are skipped. */
  def minhashSig(shingles: ArrayData, numHashes: Int): ArrayData = {
    val sig = new Array[Int](numHashes)
    java.util.Arrays.fill(sig, Int.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val bytes = shingles.getUTF8String(i).getBytes
        var s = 0
        while (s < numHashes) {
          val h = Murmur3.hashBytes(bytes, s)
          if (h < sig(s)) sig(s) = h
          s += 1
        }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** Winnowing fingerprint kernel (Schleimer/Wilkerson/Aiken, MOSS): from
    * the k-gram hash SEQUENCE, select the minimum of every window of `w`
    * consecutive hashes — rightmost occurrence on ties — recording each
    * selected position once. O(n) via a monotone deque. (This is standard
    * winnowing with a deterministic tie rule; the paper's "robust" variant
    * additionally prefers re-selecting the previous fingerprint on ties,
    * yielding slightly sparser output on tie-heavy input.) Guarantees:
    * every `w`-window contributes a selected hash (detection of any match
    * ≥ w+k-1 grams), and the fingerprint is a position-subset of the
    * input. Sequences shorter than `w` yield their single rightmost
    * minimum. */
  def winnow(hashes: ArrayData, w: Int): ArrayData = {
    val n = hashes.numElements()
    def h(i: Int): Int = hashes.getInt(i)
    if (n == 0) {
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyIntArray)
    }
    if (n <= w) {
      var best = h(0); var i = 1
      while (i < n) { if (h(i) <= best) best = h(i); i += 1 }
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array(best))
    }
    // deque of candidate indices with strictly increasing hash values;
    // >= pop makes the front the RIGHTMOST minimum of the window
    val deque = new Array[Int](n)
    var head = 0; var tail = 0 // [head, tail)
    val selected = new Array[Int](n - w + 1)
    var nSel = 0; var lastPos = -1
    var i = 0
    while (i < n) {
      while (head < tail && deque(head) <= i - w) head += 1
      while (head < tail && h(deque(tail - 1)) >= h(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (i >= w - 1) {
        val m = deque(head)
        if (m != lastPos) { selected(nSel) = h(m); nSel += 1; lastPos = m }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(selected, nSel))
  }

  // (bits, dims, seed) -> Rademacher hyperplanes; regenerated identically
  // on every executor from murmur3, so no broadcast or shipping needed.
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  private def planes(bits: Int, dims: Int, seed: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((bits, dims, seed), { key =>
      val (b, d, s) = key
      Array.tabulate(b, d) { (bi, di) =>
        val h = Murmur3.hashBytes(s"$s:$bi:$di".getBytes("UTF-8"), 0)
        if ((h & 1) == 1) 1.0 else -1.0
      }
    })

  /** Signed-random-projection signature kernel (see [[SrpSig]]). */
  def srpSig(vec: ArrayData, bits: Int, seed: Int, isFloat: Boolean): Long = {
    val dims = vec.numElements()
    val ps = planes(bits, dims, seed)
    var sig = 0L
    var b = 0
    while (b < bits) {
      val p = ps(b)
      var dot = 0.0
      var d = 0
      while (d < dims) {
        val x = if (isFloat) vec.getFloat(d).toDouble else vec.getDouble(d)
        dot += p(d) * x
        d += 1
      }
      if (dot > 0.0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** 64-bit SimHash over a token array: each token contributes a 64-bit
    * hash (two seeded murmur3_x86_32 halves, seeds 0x5131 / 0x7353); the
    * signature bit is the sign of the per-bit vote sum. Near-duplicate
    * documents differ in few bits (compare with `bit_count(a ^ b)`).
    * Null tokens are skipped. */
  def simhash(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val bytes = tokens.getUTF8String(t).getBytes
        val lo = Murmur3.hashBytes(bytes, 0x5131)
        val hi = Murmur3.hashBytes(bytes, 0x7353)
        val h = (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** `word_tokens(text)` — the corpus tokenizer as a native kernel:
  * lowercased maximal `[a-z0-9]+` runs of a STRING column, exactly
  * `regexp_extract_all(lower(text), '[a-z0-9]+', 0)` (the DuckDB oracles
  * keep using the regex form — the parity is total, see
  * [[VectorKernels.wordTokens]], and VectorKernelsPropSpec fuzzes it).
  * Native because the regex engine walks a backtracking NFA per char
  * while this is two branch tests per byte — tokenization fronts every
  * text/dedup operator, so it is the single hottest scalar in the corpus
  * pipeline. */
case class WordTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_tokens argument must be STRING, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "word_tokens"

  override protected def nullSafeEval(text: Any): Any =
    VectorKernels.wordTokens(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.VectorKernels.wordTokens($t);")

  override protected def withNewChildInternal(newChild: Expression): WordTokens =
    copy(child = newChild)
}

/** `word_ngrams(tokens, n)` — word n-gram shingles of an `ARRAY<STRING>`
  * token column: `["a","b","c","d"]` with n=3 → `["a b c", "b c d"]`;
  * inputs shorter than `n` yield one shingle of all tokens joined (so no
  * document silently drops out of the dedup universe). A native kernel
  * because the built-in `transform(sequence(...), i -> concat_ws(" ",
  * slice(tokens, i, n)))` pays an interpreted lambda + array copy per
  * shingle — the dominant cost of corpus-scale MinHash pipelines.
  */
/** `vec_sub(a, b)` — element-wise difference of two `ARRAY<FLOAT|DOUBLE>`
  * vector columns as `ARRAY<DOUBLE>`, one codegen'd kernel call. The
  * residual step of residual-encoded IVF×PQ (`r = v - centroid`); native
  * for the same reason as [[DotProduct]]: `zip_with` lambdas are
  * interpreted, and this sits in the corpus-wide encode path. Same
  * null-slot contract as [[DotProduct]]. */
case class VecSub(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_sub arguments must be ARRAY<FLOAT> or ARRAY<DOUBLE>, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "vec_sub"

  private def isFloat(e: Expression): Boolean = elemType(e).contains(FloatType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.vecSub(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernels.vecSub($a, $b, ${isFloat(left)}, ${isFloat(right)});")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecSub =
    copy(left = newLeft, right = newRight)
}

/** `bigram_stats(tokens)` → `ARRAY<BIGINT> [top, total]`: occurrence count
  * of the document's most frequent adjacent word bigram and the bigram
  * total — the Gopher-style repetition signal as ONE narrow codegen'd
  * projection. The composed alternatives both lose: explode + two-level
  * hash aggregate shuffles every distinct (doc, bigram) pair, and the
  * zero-shuffle `aggregate()`/`transform()` fold runs interpreted lambdas
  * (see [[CosineSim]]'s rationale). Kernel state is a per-document map,
  * bounded by tokens-per-doc at any corpus scale.
  */
case class BigramStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bigram_stats argument must be ARRAY<STRING>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "bigram_stats"

  override protected def nullSafeEval(tokens: Any): Any =
    VectorKernels.bigramStats(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.VectorKernels.bigramStats($t);")

  override protected def withNewChildInternal(newChild: Expression): BigramStats =
    copy(child = newChild)
}

/** `ngram_stats(tokens, n)` → `ARRAY<BIGINT> [total, distinct]`: word
  * n-gram counts without materializing the shingle array — the counting
  * face of [[WordNgrams]] for queries that only need the repetition
  * measures (Gopher dup-3-gram bound, shingle statistics).
  */
case class WordNgramStats(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"ngram_stats: n must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ngram_stats argument must be ARRAY<STRING>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "ngram_stats"

  override protected def nullSafeEval(tokens: Any): Any =
    VectorKernels.wordNgramStats(tokens.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.VectorKernels.wordNgramStats($t, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgramStats =
    copy(child = newChild)
}

/** `gopher_token_stats(text)` → `ARRAY<BIGINT> [n_words, tok_chars,
  * n_alpha_words, n_stop_distinct]`: the token-level measurements of the
  * Gopher rule filter in one codegen'd pass (the composed form pays an
  * interpreted `rlike` lambda per token). Shingle-repetition measures
  * stay on the native [[WordNgrams]] path.
  */
case class GopherTokenStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gopher_token_stats argument must be STRING, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "gopher_token_stats"

  override protected def nullSafeEval(text: Any): Any =
    VectorKernels.gopherTokenStats(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.VectorKernels.gopherTokenStats($t);")

  override protected def withNewChildInternal(newChild: Expression): GopherTokenStats =
    copy(child = newChild)
}

/** `stop_profile_counts(text)` → `ARRAY<INT> [en, de, fr, es]`: stopword
  * occurrence counts against the four language profiles in one codegen'd
  * pass over the raw text — fronts language ID and quality scoring, the
  * two projections every document of a pretraining corpus flows through;
  * the composed `filter(tokens, t -> t.isin(...))` form pays four
  * interpreted lambdas per document (equivalence pinned in TextDedupSpec).
  */
case class StopProfileCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"stop_profile_counts argument must be STRING, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "stop_profile_counts"

  override protected def nullSafeEval(text: Any): Any =
    VectorKernels.stopProfileCounts(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.VectorKernels.stopProfileCounts($t);")

  override protected def withNewChildInternal(newChild: Expression): StopProfileCounts =
    copy(child = newChild)
}

/** `int8_quant_stats(vec)` → `ARRAY<DOUBLE> [scale, max_abs_err]`: the
  * symmetric per-vector int8 compression audit as one codegen'd pass —
  * replaces a four-`transform`-lambda composition (cast, abs-max,
  * quantize, reconstruct-error) whose interpreted lambdas dominate the
  * corpus-wide audit. Same null-slot contract as [[DotProduct]].
  */
case class Int8QuantStats(child: Expression) extends UnaryExpression {

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case Some(_) => TypeCheckResult.TypeCheckSuccess
    case None => TypeCheckResult.TypeCheckFailure(
      s"int8_quant_stats argument must be ARRAY<FLOAT> or ARRAY<DOUBLE>, " +
        s"got ${child.dataType.sql}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "int8_quant_stats"

  private def isFloat: Boolean = elemType.contains(FloatType)

  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.int8QuantStats(v.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VectorKernels.int8QuantStats($v, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): Int8QuantStats =
    copy(child = newChild)
}

/** `sq8_encode(vec)` → `BINARY`: per-vector symmetric int8 quantization
  * as one self-contained container (8-byte big-endian scale + one code
  * byte per dimension) — the storage/wire format of the SQ8 ANN lane.
  * Same null-slot contract as [[DotProduct]]. */
case class Sq8Encode(child: Expression) extends UnaryExpression {

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case Some(_) => TypeCheckResult.TypeCheckSuccess
    case None => TypeCheckResult.TypeCheckFailure(
      s"sq8_encode argument must be ARRAY<FLOAT> or ARRAY<DOUBLE>, " +
        s"got ${child.dataType.sql}")
  }

  override def dataType: DataType = BinaryType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "sq8_encode"

  private def isFloat: Boolean = elemType.contains(FloatType)

  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.sq8Encode(v.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VectorKernels.sq8Encode($v, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): Sq8Encode =
    copy(child = newChild)
}

/** `sq8_cos(query_vec, sq8_bin)` → `DOUBLE`: asymmetric cosine between a
  * full-width query vector and an [[Sq8Encode]]d corpus vector — the SQ8
  * analogue of [[PqAdc]]'s compressed-domain scoring. */
case class Sq8Cos(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType: Option[DataType] = left.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType, right.dataType) match {
      case (Some(_), BinaryType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sq8_cos arguments must be (ARRAY<FLOAT|DOUBLE>, BINARY), " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "sq8_cos"

  private def isFloat: Boolean = elemType.contains(FloatType)

  override protected def nullSafeEval(q: Any, bin: Any): Any =
    VectorKernels.sq8Cos(q.asInstanceOf[ArrayData], isFloat,
      bin.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, bin) =>
      s"${ev.value} = graft.functions.VectorKernels.sq8Cos($q, $isFloat, $bin);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Sq8Cos =
    copy(left = newLeft, right = newRight)
}

/** `hashed_lr_score(text, dim)` → `BIGINT`: a feature-hashed linear model
  * score — the fastText-style quality-classifier shape — as ONE narrow
  * codegen'd projection over the raw text. Each `[a-z0-9]+` token maps to
  * one of `dim` feature buckets (`(len·31 + firstByte) mod dim`, the
  * hashing-trick projection) and the bucket's weight
  * (`(b·2654435761) mod 1001 − 500`, a fixed deterministic weight table)
  * is accumulated. A real deployment swaps the multiplicative weight rule
  * for trained weights (a `dim`-length literal array — same kernel shape);
  * the arithmetic stays integer-exact so the score is cross-engine
  * oracle-checkable, unlike a float-weight model. Scoring 100 TB is a
  * single scan: no token explode, no weight-table join, no shuffle.
  */
case class HashedLrScore(child: Expression, dim: Int) extends UnaryExpression {
  require(dim > 0, s"hashed_lr_score: dim must be positive, got $dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hashed_lr_score argument must be STRING, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "hashed_lr_score"

  override protected def nullSafeEval(text: Any): Any =
    VectorKernels.hashedLrScore(text.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.VectorKernels.hashedLrScore($t, $dim);")

  override protected def withNewChildInternal(newChild: Expression): HashedLrScore =
    copy(child = newChild)
}

case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"word_ngrams: n must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams argument must be ARRAY<STRING>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(tokens: Any): Any =
    VectorKernels.wordNgrams(tokens.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.VectorKernels.wordNgrams($t, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

/** `hash_array(arr, seed)` — element-wise seeded murmur3 of an
  * `ARRAY<STRING>`: the vectorized sibling of [[Mmh3]] (native loop
  * instead of an interpreted `transform` lambda per element).
  */
case class HashArray(child: Expression, seed: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hash_array argument must be ARRAY<STRING>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "hash_array"

  override protected def nullSafeEval(arr: Any): Any =
    VectorKernels.hashArray(arr.asInstanceOf[ArrayData], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VectorKernels.hashArray($a, $seed);")

  override protected def withNewChildInternal(newChild: Expression): HashArray =
    copy(child = newChild)
}

/** `winnow(hashes, w)` — winnowing fingerprint of an `ARRAY<INT>` hash
  * sequence (see [[VectorKernels.winnow]]). A native kernel because the
  * sliding-window-minimum has no lambda-free composition of built-ins at
  * all (a `transform(sequence(...))` formulation would be O(n·w) through
  * interpreted lambdas and still need position-dedup).
  */
case class Winnow(child: Expression, w: Int) extends UnaryExpression {
  require(w > 0, s"winnow: window must be positive, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: IntegerType, false) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow argument must be ARRAY<INT> without nulls, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "winnow"

  override protected def nullSafeEval(arr: Any): Any =
    VectorKernels.winnow(arr.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VectorKernels.winnow($a, $w);")

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

/** `minhash_sig(shingles, numHashes)` — MinHash signature of an
  * `ARRAY<STRING>` shingle column: `sig[s] = min over shingles of
  * mmh3(shingle, s)` for seeds `0..numHashes-1`. A native kernel because
  * the built-in composition `transform(sequence(0,H-1), s ->
  * array_min(transform(sh, x -> mmh3(x, s))))` routes H×|shingles| hash
  * calls through interpreted lambdas. Empty input → all-Int.MaxValue
  * signature (deterministic; such docs should be filtered upstream).
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes > 0, s"minhash_sig: numHashes must be positive, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig argument must be ARRAY<STRING>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(shingles: Any): Any =
    VectorKernels.minhashSig(shingles.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, sh =>
      s"${ev.value} = graft.functions.VectorKernels.minhashSig($sh, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `cosine_sim(a, b)` — cosine similarity of two `ARRAY<FLOAT|DOUBLE>`
  * embedding columns as one codegen'd kernel call.
  *
  * Why a native expression: the built-in composition
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` routes every element through
  * interpreted `HigherOrderFunction` lambdas — at a 25M-pair similarity
  * self-join that is ~1.6B boxed lambda invocations. This kernel is a tight
  * primitive loop inside whole-stage codegen.
  *
  * Null array SLOTS are rejected with a clear error — see [[DotProduct]]
  * for the documented contract and rationale.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim arguments must both be ARRAY<FLOAT> or ARRAY<DOUBLE>, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "cosine_sim"

  private def kernel: String = elemType(left) match {
    case Some(FloatType) => "cosineFloat"
    case _               => "cosineDouble"
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (elemType(left).contains(FloatType)) VectorKernels.cosineFloat(x, y)
    else VectorKernels.cosineDouble(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernels.$kernel($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** `dot_product(a, b)` — inner product of two `ARRAY<FLOAT|DOUBLE>` vector
  * columns as one codegen'd kernel call (same rationale as [[CosineSim]]:
  * no interpreted `aggregate(zip_with(...))` lambdas in hot paths). Used by
  * the product-quantization ADC tables and for norms via `dot(x, x)`.
  *
  * Null SLOTS inside an array are rejected at runtime with a clear error
  * (documented contract, same as [[VecSub]]): parquet-sourced embedding
  * columns type as `containsNull=true` even though the pipeline never
  * writes a null element, so the type check can't forbid them statically
  * without refusing every real embedding table — but silently reading a
  * null slot as 0.0 through the primitive accessor (the pre-guard
  * behavior) diverges from SQL semantics (DuckDB's `list_dot_product`
  * yields NULL). Embeddings with genuinely-missing dimensions must be
  * repaired or filtered upstream.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot_product arguments must both be ARRAY<FLOAT> or ARRAY<DOUBLE>, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "dot_product"

  private def kernel: String = elemType(left) match {
    case Some(FloatType) => "dotFloat"
    case _               => "dotDouble"
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (elemType(left).contains(FloatType)) VectorKernels.dotFloat(x, y)
    else VectorKernels.dotDouble(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernels.$kernel($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Shared shape of the two PQ projection kernels: `(ARRAY<DOUBLE> vector,
  * ARRAY<DOUBLE> flat codebook) -> array`, parameterized by `(m, ksub)`.
  * The codebook argument is a literal/broadcast-sized array (`m*ksub*sd`
  * doubles), so the whole encode/table step is a narrow codegen'd
  * projection straight off the scan — the plan never explodes subvectors
  * or joins against a centroid table.
  */
abstract class PqProjection extends BinaryExpression {
  def vec: Expression
  def cb: Expression
  def m: Int
  def ksub: Int

  override def left: Expression = vec
  override def right: Expression = cb

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, cb.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (v, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName arguments must be (ARRAY<DOUBLE>, ARRAY<DOUBLE>), " +
          s"got ${v.sql}, ${c.sql}")
    }

  override def nullIntolerant: Boolean = true

  protected def kernel: String

  override protected def nullSafeEval(v: Any, c: Any): Any = kernel match {
    case "pqEncode" =>
      VectorKernels.pqEncode(v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], m, ksub)
    case _ =>
      VectorKernels.pqTable(v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], m, ksub)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = graft.functions.VectorKernels.$kernel($v, $c, $m, $ksub);")
}

/** `pq_encode(vec, codebook, m, ksub)` — the vector's PQ code word
  * (ARRAY<INT>, length m): per subspace, the max-cosine centroid. */
case class PqEncode(vec: Expression, cb: Expression, m: Int, ksub: Int)
    extends PqProjection {
  require(m > 0 && ksub > 0, s"pq_encode: m/ksub must be positive")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override protected def kernel: String = "pqEncode"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(vec = newLeft, cb = newRight)
}

/** `pq_table(vec, codebook, m, ksub)` — the query's flat ADC lookup table
  * (ARRAY<DOUBLE>, length m*ksub): `dot(q_j, c_{j,code})` per slot. */
case class PqTable(vec: Expression, cb: Expression, m: Int, ksub: Int)
    extends PqProjection {
  require(m > 0 && ksub > 0, s"pq_table: m/ksub must be positive")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_table"
  override protected def kernel: String = "pqTable"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqTable =
    copy(vec = newLeft, cb = newRight)
}

/** `pq_adc(table, codes, ksub)` — asymmetric-distance-computation lookup
  * for product quantization: `table` is a flat `ARRAY<DOUBLE>` of per-
  * `(subspace, code)` partial scores laid out `j*ksub + code`, `codes` the
  * candidate's `ARRAY<INT>` PQ code word; the result is the sum of the `m`
  * table entries the codes select. One codegen'd kernel call per
  * (query, candidate) pair — the compressed-domain scoring loop that makes
  * PQ scanning memory-bandwidth-bound instead of FLOP-bound.
  */
case class PqAdc(table: Expression, codes: Expression, ksub: Int)
    extends BinaryExpression {
  require(ksub > 0, s"pq_adc: ksub must be positive, got $ksub")

  override def left: Expression = table
  override def right: Expression = codes

  override def checkInputDataTypes(): TypeCheckResult =
    (table.dataType, codes.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (t, c) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc arguments must be (ARRAY<DOUBLE>, ARRAY<INT>), got ${t.sql}, ${c.sql}")
    }

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(t: Any, c: Any): Any =
    VectorKernels.pqAdc(t.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, c) =>
      s"${ev.value} = graft.functions.VectorKernels.pqAdc($t, $c, $ksub);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(table = newLeft, codes = newRight)
}

/** `srp_sig(vec, bits, seed)` — signed-random-projection (hyperplane) LSH
  * signature of an `ARRAY<FLOAT|DOUBLE>` embedding: bit `b` is set iff the
  * dot product with pseudo-random Rademacher (±1) hyperplane `b` is
  * positive. Collision probability of two vectors on one bit is
  * `1 − θ/π` (Charikar), so near-parallel vectors share most bits — the
  * bucketing key for ANN at scale. Hyperplanes are derived deterministically
  * from `(seed, bit, dim)` via murmur3 and cached per (bits, dims, seed),
  * so executors regenerate identical planes with no broadcast.
  */
case class SrpSig(child: Expression, bits: Int, seed: Int) extends UnaryExpression {
  require(bits > 0 && bits <= 64, s"srp_sig: bits must be in 1..64, got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"srp_sig argument must be ARRAY<FLOAT> or ARRAY<DOUBLE>, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "srp_sig"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(vec: Any): Any =
    VectorKernels.srpSig(vec.asInstanceOf[ArrayData], bits, seed, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VectorKernels.srpSig($v, $bits, $seed, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): SrpSig =
    copy(child = newChild)
}

/** `simhash64(tokens)` — 64-bit SimHash signature of an `ARRAY<STRING>`
  * token column (Charikar's similarity-preserving hash; near-duplicate
  * detection via Hamming distance `bit_count(a ^ b)` on the result).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 argument must be ARRAY<STRING>, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(tokens: Any): Any =
    VectorKernels.simhash(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.VectorKernels.simhash($t);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
