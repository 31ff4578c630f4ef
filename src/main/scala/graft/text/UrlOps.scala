package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** tx19: URL parsing + domain blocklist filtering — the RefinedWeb §3.1/3.2
  * gate (Penedo et al. 2023): before any content-based scoring, a web
  * corpus drops documents by their source URL (blocklisted domains,
  * suspicious hosts). Implemented as map-side regexp extraction plus a
  * literal-list membership test — zero shuffle end to end; a
  * production-sized blocklist would broadcast and left-anti join, the same
  * plan shape as p7's keylist anti-join.
  *
  * Patterns are restricted to syntax with identical Java-regex/RE2
  * semantics (the tx15 convention), so extracted hosts and the blocklist
  * decision hash bit-for-bit cross-engine.
  */
object UrlOps {

  /** Host (authority) of an absolute URL: text between `scheme://` and the
    * first `/`, `?`, or `#`.
    */
  def host(url: Column): Column =
    regexp_extract(url, "^[a-z]+://([^/?#]+)", 1)

  /** Registrable-domain approximation: the last two dot-labels of the host
    * (a public-suffix list is a lookup-table refinement, not a different
    * plan shape).
    */
  def registrableDomain(hostCol: Column): Column =
    regexp_extract(hostCol, "([^.]+\\.[^.]+)$", 1)

  /** Membership test against a literal blocklist of registrable domains. */
  def isBlocked(domain: Column, blocklist: Seq[String]): Column =
    domain.isInCollection(blocklist)
}
