package graft.pipeline

/** The reference's layered configuration (`config/__init__.py:9-15` +
  * `config/base.py:10-19`, the A18 surface): a base settings map sourced
  * from environment variables with defaults, then profile overlays where
  * LATER LAYERS WIN (`dict.update` semantics).
  *
  * Faithfulness notes:
  *  - The reference guards BOTH the dev and production overlays on the
  *    same `not os.getenv('DEBUG')` condition (`config/__init__.py:11-15`)
  *    — almost certainly a typo for dev-when-DEBUG (both overlay dicts
  *    are empty, so it is unobservable there). This analog implements the
  *    evident intent: dev overlay when `DEBUG` is set, production when
  *    not. Either way the layering semantics — base then overlay, last
  *    write wins — are the contract.
  *  - Values are strings at rest (env vars are untyped) and coerced at
  *    the use site, exactly like `int(SETTINGS.get(...))` at
  *    `main.py:10`; [[Settings.int]] centralizes that coercion.
  */
final case class Settings(entries: Map[String, String]) {
  /** `dict.update`: keys in `later` replace keys here. */
  def overlay(later: Map[String, String]): Settings =
    Settings(entries ++ later)
  def get(key: String): Option[String] = entries.get(key)
  /** Typed accessor with the main.py:10 coercion; a present-but-malformed
    * value fails loudly (the reference's int() would throw too). */
  def int(key: String, default: Int): Int =
    entries.get(key).map(_.trim.toInt).getOrElse(default)
}

object Settings {
  /** Keys the pipeline consumes (base.py:13-19 names, kept verbatim). */
  val MinutesUpdateInterval = "MINUTES_UPDATE_INTERVAL"
  val StateDir = "STATE_DIR"
  val OutputDir = "OUTPUT_DIR"

  /** base.py defaults: only the interval has one (15); credential/path
    * keys are absent unless the environment provides them. */
  private def base(env: Map[String, String]): Map[String, String] =
    Map(MinutesUpdateInterval ->
      env.getOrElse(MinutesUpdateInterval, "15")) ++
      Seq(StateDir, OutputDir).flatMap(k => env.get(k).map(k -> _))

  /** Profile overlays — empty like the reference's dev.py/production.py,
    * here so deployments can fill them in one place. */
  val dev: Map[String, String] = Map.empty
  val production: Map[String, String] = Map.empty

  /** `config/__init__.py` assembly: base ← profile(DEBUG) ← overrides.
    * `overrides` is the programmatic last layer (tests, notebooks). */
  def load(env: Map[String, String] = sys.env,
      overrides: Map[String, String] = Map.empty): Settings =
    Settings(base(env))
      .overlay(if (env.contains("DEBUG")) dev else production)
      .overlay(overrides)
}
