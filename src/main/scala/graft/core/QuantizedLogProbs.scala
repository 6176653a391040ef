package graft.core

/** Immutable token → quantized-log-prob table with an unseen-token
  * default — one label's scoring half of the fitted Naive Bayes model
  * ([[graft.operators.NaiveBayes]]'s exactness contract: values are
  * BIGINT-quantized `round(ln p · 10⁶)`, so scores sum as integers).
  *
  * Built ONCE driver-side from the bounded model artifact and broadcast;
  * the serving kernel then does one O(1) hash probe per token occurrence.
  * This is the production replacement for probing a Catalyst map literal,
  * whose `element_at` is a linear scan over the literal's key array —
  * fine for a toy vocab, quadratic pain at 10⁶ tokens.
  */
final class QuantizedLogProbs(
    entries: java.util.HashMap[String, java.lang.Long],
    val default: Long) extends Serializable {

  def lookup(token: String): Long = {
    val v = entries.get(token)
    if (v == null) default else v.longValue()
  }

  def size: Int = entries.size
}

object QuantizedLogProbs {
  def apply(m: Map[String, Long], default: Long): QuantizedLogProbs = {
    val h = new java.util.HashMap[String, java.lang.Long](m.size * 2)
    m.foreach { case (k, v) => h.put(k, java.lang.Long.valueOf(v)) }
    new QuantizedLogProbs(h, default)
  }
}
