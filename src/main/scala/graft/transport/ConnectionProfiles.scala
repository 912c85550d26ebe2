package graft.transport

/** Named connection profiles (reference roadmap "Connection profiles —
  * named connection configurations", /root/reference/docs/GUIDE.md:494):
  * register a connection bundle once, reference it from any scan with
  * `option("profile", name)` instead of repeating url/credential options
  * per query.
  *
  * Scope and precedence:
  *   - a profile may carry CONNECTION options only ([[ConnectionKeys]]:
  *     url, user_creds, nkey_seed, tls, connect_timeout_ms) — query-shape
  *     options (seq/time bounds, subject, slice width…) stay per-scan;
  *     registration rejects anything else at once, not at first use;
  *   - explicit scan options override the profile's values (a profile is
  *     a default bundle, not a lock); the merged map then flows through
  *     the existing bind-time validation unchanged, so mutual-exclusion
  *     rules (e.g. creds vs nkey) fire exactly as if typed inline;
  *   - an unknown profile name is a bind-time error listing what IS
  *     registered (mirrors the reference's unknown-parameter style).
  *
  * The registry is a JVM-wide concurrent map — profiles registered on the
  * driver are visible to every session in the JVM. Executors never need
  * it: resolution happens at bind time and only resolved values travel in
  * the serialized scan. */
object ConnectionProfiles {

  /** the option keys a profile may set */
  val ConnectionKeys: Set[String] =
    Set("url", "user_creds", "nkey_seed", "tls", "tls_ca", "tls_insecure",
      "connect_timeout_ms")

  private val profiles =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, String]]()

  def register(name: String, opts: Map[String, String]): Unit = {
    require(name.nonEmpty, "connection profile name must be non-empty")
    val unknown = opts.keySet.map(_.toLowerCase) -- ConnectionKeys
    require(unknown.isEmpty,
      s"connection profile '$name': non-connection option(s) " +
        s"${unknown.toSeq.sorted.mkString(", ")} — a profile may only set " +
        s"${ConnectionKeys.toSeq.sorted.mkString(", ")}")
    require(opts.keys.exists(_.equalsIgnoreCase("url")),
      s"connection profile '$name' must set 'url'")
    profiles.put(name, opts.map { case (k, v) => k.toLowerCase -> v })
  }

  def remove(name: String): Unit = profiles.remove(name)

  def registered: Seq[String] = {
    import scala.jdk.CollectionConverters._
    profiles.keys.asScala.toSeq.sorted
  }

  /** Merge a scan's options with its named profile (if any): profile
    * values are defaults, explicit options win. Case-insensitive on the
    * profile key itself (DSv2 option maps are case-insensitive). */
  def resolve(props: Map[String, String]): Map[String, String] =
    props.find(_._1.equalsIgnoreCase("profile")) match {
      case None => props
      case Some((profileKey, name)) =>
        val base = Option(profiles.get(name)).getOrElse(sys.error(
          s"nats_scan: unknown connection profile '$name'" +
            (if (registered.isEmpty) " (none registered)"
             else s" — registered: ${registered.mkString(", ")}")))
        val explicit = props - profileKey
        val explicitKeys = explicit.keySet.map(_.toLowerCase)
        base.filterNot { case (k, _) => explicitKeys.contains(k) } ++ explicit
    }
}
