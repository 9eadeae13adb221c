package graft.pipeline

/** randomfailureprocessor (processor/randomfailureprocessor/processor.go:48-67,
  * config.go:18-40): with probability `failure_rate` a consume call returns
  * (data, error) — the telemetry is NOT dropped by the processor itself; the
  * upstream's error handling retries or routes it. The component exists to
  * test pipeline error resiliency.
  *
  * Deterministic model: the Bernoulli draw hashes (seed, batch identity,
  * attempt) through the same 60-bit md5 family the oracles replicate — so a
  * given attempt's failures are exactly reproducible (and SQL-checkable),
  * while a RETRY re-draws, exactly as a retried consume call re-rolls
  * rand.Float64(). The resilience property it exists to exercise lives in
  * the Manifest plane: a failed attempt loses no committed partition, and
  * retries complete the run idempotently (locked by ResumeSpec).
  *
  * Validation mirrors config.go:29-40 (rate ∈ [0,1], non-empty message).
  */
case class RandomFailure(failureRate: Double = 0.5,
                         errorMessage: String = "random failure",
                         seed: String = "graft") {
  require(failureRate >= 0.0 && failureRate <= 1.0,
    "failure_rate must be between 0 and 1")
  require(errorMessage.nonEmpty, "error_message must be a non-empty string")

  /** Uniform-ish draw in [0,1): md5-60bit(seed|batch|attempt) / 16^15. */
  def draw(batchId: String, attempt: Int = 0): Double =
    RandomFailure.hash60(s"$seed|$batchId|$attempt").toDouble / RandomFailure.Max

  /** Throws `errorMessage` with probability `failureRate` for this
    * (batch, attempt) — the processor's error return.
    */
  def check(batchId: String, attempt: Int = 0): Unit =
    if (draw(batchId, attempt) < failureRate)
      throw new RuntimeException(errorMessage)
}

object RandomFailure {
  /** 16^15 = 2^60: the range of the 15-hex-digit md5 prefix — the same
    * portable hash family as `Dedup.md5Hash64` (kept numerically identical
    * so failure schedules are SQL-replicable).
    */
  val Max: Double = math.pow(16.0, 15)

  def hash60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }
}
