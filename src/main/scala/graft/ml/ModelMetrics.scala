package graft.ml

/** Model-quality metrics artifact: a flat JSON map of metric -> value.
  *
  * The ML fits are rows-only in the correctness gate by necessity (SQL
  * cannot replay an iterative fit), so their QUALITY is gated here
  * instead: MlSpec computes each pipeline's metrics with pinned seeds,
  * asserts them inside tolerance bands, and emits this artifact — a
  * silent model break (feature drift, seed loss, library behavior
  * change) now fails the suite rather than surviving as a plausible row
  * count. Bands, not bit-equality: SURVEY §5 — fits are deterministic
  * per Spark version, not across versions.
  */
object ModelMetrics {

  /** Serialize and write metrics as one sorted flat JSON object. */
  def write(path: String, metrics: Map[String, Double]): Unit = {
    val body = metrics.toSeq.sortBy(_._1)
      .map { case (k, v) =>
        val vs = if (v == v.floor && v.abs < 1e15) v.toLong.toString else v.toString
        s""""$k": $vs"""
      }
      .mkString("{\n  ", ",\n  ", "\n}\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), body)
  }
}
