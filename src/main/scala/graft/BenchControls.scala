package graft

/** AMBIENT-NOISE CONTROLS shared by [[Bench]] and [[BenchFocus]]:
  * five pinned queries whose code and plan are intentionally frozen
  * across rounds, with their round-14 idle-host sf0.1 reference
  * medians. Their medians in any given run, against these references,
  * give that run's ambient index (geometric mean of ratios) —
  * byte-untouched queries bounced 1.4-2.1x between rounds on pure
  * machine noise, so a cross-round comparison is only meaningful as
  * ratio-over-ambient. Update the references when (and only when) a
  * control query's code legitimately changes.
  *
  * References are sf0.1 numbers: the ambient index is meaningful only
  * when the run's SF dir is sf0.1 (the driver bench); smoke runs at
  * other SFs still emit it but consumers must read the `ambient_ref`
  * label before trusting it.
  */
object BenchControls {
  val refSf = "sf0.1@r14"
  val refs: Seq[(String, Double)] = Seq(
    "q07_agg_distinct" -> 0.523, "q16_date_bin" -> 0.523,
    "q100_regression" -> 2.831, "q58_listagg" -> 1.031,
    "t04_fingerprint" -> 0.279)

  /** Geometric mean of median/ref over the controls present. */
  def ambientIndex(medianOf: String => Option[Double]): Option[Double] = {
    val ratios = refs.flatMap { case (q, ref) =>
      medianOf(q).filter(_ > 0).map(m => math.log(m / ref)) }
    if (ratios.isEmpty) None
    else Some(math.exp(ratios.sum / ratios.size))
  }

  /** 1-minute system load average (-1.0 where unsupported) — the
    * cheap host-pressure probe that lets a bench record prove "that
    * outlier rode a loaded host" instead of leaving a phantom. */
  def loadAvg(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .getSystemLoadAverage

  /** Locale-proof fixed-point render: `f"%.3f"` interpolators follow
    * the JVM default locale, and a comma-decimal host would corrupt
    * the bench record's JSON numbers. */
  def num(d: Double, digits: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${digits}f", Double.box(d))
}
