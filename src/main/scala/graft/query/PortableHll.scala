package graft.query

/** Shared fragments of the PORTABLE HyperLogLog (m = 256 registers,
  * md5-bucketed 60-bit hash): single source of truth for the Spark
  * expressions AND the DuckDB oracles of q36 (per-day sketch union)
  * and q12 (per-event_type approx distinct). Only integer-div / shift
  * syntax differs between the engines; everything here is text both
  * parse identically.
  *
  * Register layout: hv = 60-bit md5 prefix; idx = hv % 256 selects the
  * register; w = hv div 256 is the 52-bit payload whose
  * rank-of-leading-one is the register value.
  */
object PortableHll {

  /** Number of registers (m). */
  val M = 256

  /** rho = rank of the leading one of the 52-bit register payload
    * (w = h div m): 1 for the top bit … 52 for w=1, 53 for w=0 — a
    * pure integer CASE ladder, identical text on both engines. */
  def rhoLadder(w: String): String =
    (0 until 52).map(i => s"WHEN $w >= ${1L << (51 - i)} THEN ${i + 1}")
      .mkString("CASE ", " ", " ELSE 53 END")

  /** HLL estimate from (occupied, s_present): raw = α·m²·2⁵³ / S with
    * S = Σ 2^(53−M_j) (absent registers contribute 2⁵³ each — M=0);
    * linear-counting branch below 2.5·m. All inputs exact integers,
    * and the fractional constants are CAST to DOUBLE explicitly so
    * both engines evaluate the same IEEE-754 tree (Spark would
    * otherwise parse 0.7213/1.079 as DECIMAL and run the head of the
    * tree in decimal arithmetic while DuckDB promotes to DOUBLE). */
  val estimateExpr: String = {
    val raw = "(CAST(0.7213 AS DOUBLE) / (1 + CAST(1.079 AS DOUBLE) / 256))" +
      " * 256 * 256 * 9007199254740992" +
      " / (s_present + (256 - occupied) * 9007199254740992)"
    s"CAST(floor(CASE WHEN $raw <= CAST(640 AS DOUBLE) AND (256 - occupied) > 0 " +
      s"THEN 256 * ln(CAST(256 AS DOUBLE) / (256 - occupied)) " +
      s"ELSE $raw END) AS BIGINT) AS approx_users"
  }
}
