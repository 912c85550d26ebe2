package graft.transport

/** NATS wildcard subject filters — the server-side filtering language every
  * JetStream consumer speaks (`filter_subject`), which the reference only
  * approximates with substring matching (/root/reference/src/nats_scan.cpp:741-746
  * explicitly documents "substring, NOT wildcard" as a limitation).
  *
  * Grammar (public NATS subject rules):
  *   - subjects are '.'-separated non-empty tokens: `events.purchase.42`
  *   - `*` matches EXACTLY ONE token:   `events.*.42` ~ any event type
  *   - `>` matches ONE OR MORE trailing tokens and must be the final token:
  *     `events.purchase.>` ~ everything under the purchase branch
  *
  * Matching is token-wise string comparison — no regex on the hot path. The
  * scale hooks live next to the matcher:
  *   - [[literalPrefix]]: the longest literal token prefix of a pattern.
  *     Every matching subject starts with it, so it feeds the same
  *     row-group min/max pruning as a pushed `StringStartsWith`
  *     (docs/SUBJECT_PRUNING.md) and a pushable Catalyst prefix filter.
  *   - [[toRegex]]: the equivalent anchored regex, for expressing the SAME
  *     predicate as a codegen'd Catalyst `RLIKE` on the DataFrame side (and
  *     for the DuckDB oracle).
  */
object SubjectFilter {

  /** Bind-time validation: fail at bind with a pointed message, the same
    * policy as the seq/time mutual exclusions. */
  def validate(pattern: String): Unit = {
    val ts = tokens(pattern)
    if (ts.isEmpty || ts.exists(_.isEmpty))
      sys.error(s"nats_scan: subject_filter '$pattern' has an empty token " +
        "(subjects are '.'-separated non-empty tokens)")
    ts.zipWithIndex.foreach { case (t, i) =>
      if (t == ">" && i != ts.length - 1)
        sys.error(s"nats_scan: subject_filter '$pattern' — '>' must be the " +
          "final token (it matches all remaining tokens)")
      if (t.length > 1 && (t.contains("*") || t.contains(">")))
        sys.error(s"nats_scan: subject_filter '$pattern' — wildcards '*' " +
          s"and '>' must stand alone as a full token (got '$t')")
    }
  }

  private def tokens(pattern: String): Array[String] =
    pattern.split("\\.", -1) // keep trailing empties so `a..b` fails validation

  /** Precompiled matcher — build once per reader, match per message. */
  final class Matcher private[SubjectFilter] (pat: Array[String]) extends Serializable {
    private val tailGt = pat.nonEmpty && pat.last == ">"
    def matches(subject: String): Boolean = {
      if (subject == null) return false
      val st = subject.split("\\.", -1)
      if (st.exists(_.isEmpty)) return false // not a valid subject
      val fixed = if (tailGt) pat.length - 1 else pat.length
      if (tailGt) { if (st.length <= fixed) return false }
      else if (st.length != fixed) return false
      var i = 0
      while (i < fixed) {
        val p = pat(i)
        if (p != "*" && p != st(i)) return false
        i += 1
      }
      true
    }
  }

  def matcher(pattern: String): Matcher = {
    validate(pattern)
    new Matcher(tokens(pattern))
  }

  /** True when `pattern` names exactly one subject (no `*`/`>` tokens) —
    * the case a server can serve from its per-subject index. */
  def isLiteral(pattern: String): Boolean =
    !pattern.contains('*') && !pattern.contains('>')

  /** Longest literal prefix every matching subject must start with —
    * `events.purchase.*` → `"events.purchase."` (the dot is valid: a
    * wildcard always demands at least one more token), `events.*.7` →
    * `"events."`, `*.x` → `""`, and a wildcard-FREE pattern is its own
    * prefix verbatim (`a.b.c` → `"a.b.c"` — a trailing dot there would
    * exclude the only matching subject). Feeds row-group min/max pruning
    * and a pushable `startswith` Catalyst filter; always a correct
    * over-approximation. */
  def literalPrefix(pattern: String): String = {
    val ts = tokens(pattern)
    val lead = ts.takeWhile(t => t != "*" && t != ">")
    if (lead.isEmpty) ""
    else if (lead.length == ts.length) pattern // pure literal: exact subject
    else lead.mkString("", ".", ".")
  }

  /** Deterministic subject shard for [[JetStreamTransport.lastForSubjects]]:
    * FNV-1a over the UTF-8 bytes, floorMod into `n` buckets. Pinned here (not
    * `String.hashCode`) so ANY binding — fake server, live client-side
    * sharding over a subjects listing — lands the same subject in the same
    * shard. */
  def shard(subject: String, n: Int): Int = {
    var h = 0x811c9dc5
    val bs = subject.getBytes("UTF-8")
    var i = 0
    while (i < bs.length) { h = (h ^ (bs(i) & 0xff)) * 0x01000193; i += 1 }
    Math.floorMod(h, n)
  }

  /** Anchored Java/RE2-compatible regex expressing the same predicate:
    * `*` → `[^.]+` (one token), trailing `>` → `[^.]+(\.[^.]+)*` (≥1 more
    * NON-EMPTY tokens — a bare `.+` would accept malformed subjects with
    * empty tokens like `a.b..c` that [[Matcher.matches]] rejects, and the
    * two sides are documented as the identical predicate). */
  def toRegex(pattern: String): String = {
    validate(pattern)
    val body = tokens(pattern).map {
      case "*" => "[^.]+"
      case ">" => "[^.]+(\\.[^.]+)*"
      case lit => java.util.regex.Pattern.quote(lit)
    }.mkString("\\.")
    // Pattern.quote emits \Q..\E blocks; tokens joined with a literal dot
    "^" + body + "$"
  }
}
