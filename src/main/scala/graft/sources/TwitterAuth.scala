package graft.sources

import org.slf4j.LoggerFactory

/** C4 — auth/config from environment (SURVEY.md §2.6): the reference builds
  * its streaming-API token from four env vars declared in `.Renviron`
  * (/root/reference/main.R:193-200). The engine reads the same variables and
  * hands them to whatever network source connector is in use; the offline
  * file-source replay path ignores them, exactly like the reference's
  * `parse=FALSE` files can be replayed without a token.
  */
final case class TwitterAuth(
    consumerKey: Option[String],
    consumerSecret: Option[String],
    accessToken: Option[String],
    accessSecret: Option[String]) {

  def isComplete: Boolean =
    Seq(consumerKey, consumerSecret, accessToken, accessSecret)
      .forall(_.exists(_.nonEmpty))

  /** Source-connector options map (only the set keys). */
  def asOptions: Map[String, String] = Map(
    "consumer.key" -> consumerKey, "consumer.secret" -> consumerSecret,
    "access.token" -> accessToken, "access.secret" -> accessSecret)
    .collect { case (k, Some(v)) => k -> v }
}

object TwitterAuth {
  private val log = LoggerFactory.getLogger(getClass)

  /** The .Renviron variable names (reference `.Renviron:1-4`). */
  val EnvKeys: Seq[String] =
    Seq("TW_CONSUMER_KEY", "TW_CONSUMER_SECRET", "TW_ACCESS_TOKEN", "TW_ACCESS_SECRET")

  def from(env: String => Option[String]): TwitterAuth = {
    val Seq(ck, cs, at, as) = EnvKeys.map(env)
    TwitterAuth(ck, cs, at, as)
  }

  /** Reads the token config from the process environment, logging the
    * reference's token-creation banner (main.R:194) with values redacted. */
  def fromEnv(): TwitterAuth = {
    val auth = from(k => sys.env.get(k))
    log.info("Creating the twitter authorization token " +
      s"(configured=${auth.isComplete}, keys set=${auth.asOptions.size}/4)")
    auth
  }
}
