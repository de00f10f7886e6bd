package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{Settings, SlotPipeline}

/** The A18 config layer: base-from-env defaults, profile overlay
  * selection, last-layer-wins semantics, and the entry-point coercions
  * (`config/__init__.py:9-15`, `main.py:10,29`). */
class SettingsSpec extends AnyFunSuite {

  test("base defaults apply when the environment is empty") {
    val s = Settings.load(env = Map.empty)
    assert(s.int(Settings.MinutesUpdateInterval, 15) == 15)
    assert(s.get(Settings.StateDir).isEmpty)
  }

  test("environment values override base defaults and coerce at use") {
    val s = Settings.load(env = Map(
      Settings.MinutesUpdateInterval -> "5",
      Settings.StateDir -> "/tmp/state"))
    assert(s.int(Settings.MinutesUpdateInterval, 15) == 5)
    assert(SlotPipeline.intervalMsOf(s) == 5L * 60 * 1000)
    assert(s.get(Settings.StateDir).contains("/tmp/state"))
  }

  test("overlay layering: later layers win, missing keys fall through") {
    val s = Settings.load(
      env = Map(Settings.MinutesUpdateInterval -> "5",
        Settings.OutputDir -> "/data/out"),
      overrides = Map(Settings.MinutesUpdateInterval -> "30"))
    assert(s.int(Settings.MinutesUpdateInterval, 15) == 30) // override wins
    assert(s.get(Settings.OutputDir).contains("/data/out")) // env survives
  }

  test("a malformed numeric value fails loudly, like the reference int()") {
    val s = Settings.load(env = Map(Settings.MinutesUpdateInterval -> "soon"))
    intercept[NumberFormatException] {
      s.int(Settings.MinutesUpdateInterval, 15)
    }
  }

  test("fromSettings demands the path keys the pipeline cannot run without") {
    val e = intercept[IllegalArgumentException] {
      SlotPipeline.fromSettings(TestSpark.spark,
        Settings.load(env = Map.empty))
    }
    assert(e.getMessage.contains(Settings.StateDir))
  }

  test("fromSettings builds a working pipeline (state path wiring)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-settings")
    val s = Settings.load(env = Map(
      Settings.StateDir -> s"$tmp/state",
      Settings.OutputDir -> s"$tmp/out"))
    val p = SlotPipeline.fromSettings(TestSpark.spark, s)
    // bootstrap path: no state file yet -> hour-truncated now - 45 min
    val now = java.time.Instant.parse("2024-01-10T12:34:56Z")
    assert(p.nextSlot(now) == java.time.Instant.parse("2024-01-10T11:15:00Z"))
  }
}
