package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference connect-retry behavior (`mysql.py:279-332`):
  * succeed-first-try, retriable retry with reconfig + backoff,
  * non-retriable immediate failure, retry exhaustion, jittered
  * exponential backoff schedule. */
class RetryPolicySpec extends AnyFunSuite {

  private def policy(slept: collection.mutable.Buffer[Double]) =
    RetryPolicy(jitter = () => 0.5, sleeper = s => slept += s)

  private val serverIdConflict: Throwable => Boolean =
    _.getMessage.contains("server_uuid/server_id")

  test("first-try success: no sleeps, no reconfig") {
    val slept = collection.mutable.Buffer.empty[Double]
    var reconfigs = 0
    val got = policy(slept).connectWithRetry(
      () => 42, serverIdConflict, _ => reconfigs += 1)
    assert(got == 42 && slept.isEmpty && reconfigs == 0)
  }

  test("retriable failures reconfigure, back off, then succeed") {
    val slept = collection.mutable.Buffer.empty[Double]
    val ids = collection.mutable.Buffer.empty[Int]
    var calls = 0
    val got = policy(slept).connectWithRetry(
      () => {
        calls += 1
        if (calls <= 2)
          throw new RuntimeException("server_uuid/server_id conflict")
        "connected"
      },
      serverIdConflict,
      attempt => ids += attempt)
    assert(got == "connected" && calls == 3)
    // exponential schedule with the stubbed jitter: 2^1+0.5, 2^2+0.5
    assert(slept.toSeq == Seq(2.5, 4.5))
    assert(ids.toSeq == Seq(1, 2))
  }

  test("non-retriable failure raises DataSourceError immediately") {
    val slept = collection.mutable.Buffer.empty[Double]
    val e = intercept[DataSourceError] {
      policy(slept).connectWithRetry(
        () => throw new RuntimeException("Access denied"),
        serverIdConflict)
    }
    assert(e.getMessage.contains("Failed to connect"))
    assert(e.getMessage.contains("Access denied"))
    assert(slept.isEmpty)
  }

  test("exhausted retries raise the attempts-exhausted error") {
    val slept = collection.mutable.Buffer.empty[Double]
    var calls = 0
    val e = intercept[DataSourceError] {
      policy(slept).connectWithRetry(
        () => {
          calls += 1
          throw new RuntimeException("server_uuid/server_id conflict")
        },
        serverIdConflict)
    }
    // the LAST attempt is no longer retriable (attempt == max-1) and
    // surfaces as the immediate-failure error, after 4 backoffs —
    // exactly the reference's loop shape
    assert(calls == 5)
    assert(slept.size == 4)
    assert(e.getMessage.contains("Failed to connect"))
  }

  test("replay-source IO classifier: transient IO retries, missing file fails fast") {
    import graft.sources.ReplayMicroBatchStream.retriableIo
    assert(retriableIo(new java.io.IOException("connection reset")))
    assert(!retriableIo(new java.io.FileNotFoundException("/gone.parquet")))
    assert(!retriableIo(new RuntimeException("corrupt footer")))
  }

  test("default jitter stays inside the reference's (0.1, 1.0) band") {
    val p = RetryPolicy()
    (1 to 100).foreach { _ =>
      val j = p.jitter()
      assert(j >= 0.1 && j <= 1.0)
    }
    assert(p.backoffSeconds(3) >= 8.1 && p.backoffSeconds(3) <= 9.0)
  }
}
