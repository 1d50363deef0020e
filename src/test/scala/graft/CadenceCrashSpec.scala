package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Runs [[CadenceCrashProbe]] in CI: real child JVMs, real SIGKILLs
  * (Process.destroyForcibly) aimed mid-append, between micro-batches, and
  * mid-overlay-refresh, then restart-to-completion — the served overlay
  * must equal a from-scratch rebuild. This is IngestCadenceSpec's
  * planted-orphan pin upgraded to a demonstrated recovery from genuinely
  * dead processes (round-13 verdict item 4). */
class CadenceCrashSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val artDir = Files.createTempDirectory("graft-crashspec-art").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.graft.materialize.dir", artDir)
    .appName("cadence-crash-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("cadence survives kill -9 mid-append, between batches, and mid-refresh") {
    val report = CadenceCrashProbe.run(spark, "/root/testdata/sf0.001").toMap

    // the kills genuinely fired and genuinely killed (137 = 128+SIGKILL);
    // a child that outran its kill would make the run vacuous — fail it
    // so the timing gets retuned rather than silently not testing
    Seq("drain_kill_mid_batch1", "drain_kill_after_batch1",
        "finalize_kill_mid_refresh").foreach { k =>
      assert(report(k).contains("exit=137") && report(k).contains("killFired=true"),
        s"$k did not die by SIGKILL: ${report(k)}")
    }
    assert(report("drain_complete").contains("exit=0") &&
      report("drain_complete").contains("GRAFT_CADENCE_DRAINED"),
      s"recovery drain did not complete: ${report("drain_complete")}")
    assert(report("finalize_complete").contains("exit=0") &&
      report("finalize_complete").contains("GRAFT_CADENCE_FINALIZED"),
      s"recovery finalize did not complete: ${report("finalize_complete")}")

    assert(report("converged") == "true",
      s"served overlay diverged from from-scratch rebuild: $report")
  }
}
