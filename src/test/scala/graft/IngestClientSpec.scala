package graft

import scala.collection.mutable

import graft.sources.IngestClient
import graft.sources.IngestClient.{RateLimited, Retryable, RetryPolicy}

/** Pins the collector's client-side protocol (S1-S3's
  * retry/backoff/pacing/fan-out) with an injected clock — no network,
  * no wall-clock waits. */
class IngestClientSpec extends SparkSpec {

  private def recordingSleep(log: mutable.Buffer[Long]): Long => Unit =
    ms => log += ms

  test("transient failures back off exponentially, then succeed") {
    val sleeps = mutable.Buffer.empty[Long]
    var calls = 0
    val out = IngestClient.withRetries(RetryPolicy(), recordingSleep(sleeps)) {
      attempt =>
        calls += 1
        if (attempt < 2) throw Retryable(s"boom $attempt") else "ok"
    }
    assert(out == "ok")
    assert(calls == 3)
    assert(sleeps.toSeq == Seq(1000L, 2000L)) // base * 2^attempt
  }

  test("a 429 sleeps the server's Retry-After, not the backoff") {
    val sleeps = mutable.Buffer.empty[Long]
    val out = IngestClient.withRetries(RetryPolicy(), recordingSleep(sleeps)) {
      attempt => if (attempt == 0) throw RateLimited(5000L) else "ok"
    }
    assert(out == "ok")
    assert(sleeps.toSeq == Seq(5000L))
  }

  test("retries exhaust loudly with the last failure") {
    val sleeps = mutable.Buffer.empty[Long]
    val ex = intercept[Retryable] {
      IngestClient.withRetries(RetryPolicy(maxRetries = 2),
        recordingSleep(sleeps))(a => throw Retryable(s"fail $a"))
    }
    assert(ex.reason == "fail 2") // attempts 0, 1, 2 -> 3 calls
    assert(sleeps.toSeq == Seq(1000L, 2000L))
  }

  test("non-retryable failures propagate immediately") {
    var calls = 0
    intercept[IllegalStateException] {
      IngestClient.withRetries(RetryPolicy(), _ => ()) { _ =>
        calls += 1
        throw new IllegalStateException("auth misconfigured")
      }
    }
    assert(calls == 1)
  }

  test("fanout chunks ids, paces calls, and preserves order") {
    val sleeps = mutable.Buffer.empty[Long]
    var clock = 0L
    val batches = mutable.Buffer.empty[Seq[Int]]
    val out = IngestClient.fanout((1 to 7).toSeq, 3, RetryPolicy(),
      () => clock, ms => { sleeps += ms; clock += ms }) { chunk =>
      batches += chunk
      clock += 10 // each call takes 10ms -> pacing must top up to 100
      chunk.sum
    }
    assert(batches.toSeq == Seq(Seq(1, 2, 3), Seq(4, 5, 6), Seq(7)))
    assert(out == Seq(6, 15, 7))
    // two gaps between three calls, each topped up to the 100ms floor
    assert(sleeps.toSeq == Seq(90L, 90L))
  }

  test("fanout retries each chunk independently") {
    val failed = mutable.Set.empty[Seq[Int]]
    val out = IngestClient.fanout(Seq(1, 2, 3, 4), 2, RetryPolicy(),
      () => 0L, _ => ()) { chunk =>
      if (failed.add(chunk)) throw Retryable("first time fails")
      chunk.sum
    }
    assert(out == Seq(3, 7))
  }

  test("fanout laws: chunks partition the ids in order at every batch size") {
    val rnd = new scala.util.Random(11)
    (1 to 20).foreach { trial =>
      val n = rnd.nextInt(300)
      val ids = (1 to n).map(_ => rnd.nextInt(1000))
      val batch = 1 + rnd.nextInt(120)
      val chunks = mutable.Buffer.empty[Seq[Int]]
      IngestClient.fanout(ids, batch, RetryPolicy(), () => 0L, _ => ())(
        c => chunks += c)
      // concatenation reconstructs the input exactly (no id lost,
      // duplicated, or reordered), every chunk within the cap, and
      // the call count is exactly ceil(n / batch)
      assert(chunks.toSeq.flatten == ids, s"trial $trial")
      assert(chunks.forall(_.size <= batch), s"trial $trial")
      assert(chunks.dropRight(1).forall(_.size == batch), s"trial $trial")
      assert(chunks.size == (n + batch - 1) / batch, s"trial $trial")
    }
  }

  test("TokenManager law: never serves inside the expiry guard band") {
    // arbitrary interleavings of clock advances and bearer() calls:
    // every served token must have been minted within the last
    // (expires_in - early) window, and refresh count == number of
    // distinct tokens ever minted (no redundant grants)
    val rnd = new scala.util.Random(23)
    (1 to 10).foreach { trial =>
      var clock = 0L
      var minted = 0
      val mintedAt = mutable.Map.empty[String, Long]
      val expiresSec = 600L + rnd.nextInt(3600)
      val tm = new IngestClient.TokenManager(
        () => {
          minted += 1
          val t = s"t$minted"
          mintedAt(t) = clock
          IngestClient.Token(t, expiresSec)
        },
        now = () => clock)
      (1 to 50).foreach { _ =>
        clock += rnd.nextInt(20) * 60000L // advance 0..19 minutes
        val tok = tm.bearer()
        val age = clock - mintedAt(tok)
        assert(age < expiresSec * 1000L - 5 * 60000L,
          s"trial $trial: served a token $age ms old " +
            s"(lifetime ${expiresSec}s)")
      }
      assert(tm.refreshes == minted, s"trial $trial")
      assert(minted <= 51, s"trial $trial: redundant grants ($minted)")
    }
  }
}
