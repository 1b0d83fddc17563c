package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.LynxEngine
import graft.http.{LynxServer, ShardRouter}

/** The namespace-sharding router over REAL embedded engine backends:
  * stable routing, per-shard data scoping, the q_shard_rendezvous
  * minimal-movement invariant asserted at the serving layer, and the
  * owner-down failure contract.
  */
class ShardRouterSpec extends AnyFunSuite {

  private val client = HttpClient.newHttpClient()

  private def post(port: Int, path: String, body: String)
      : HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def get(port: Int, path: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def withCluster(n: Int)(
      f: (ShardRouter, Seq[(String, LynxServer, Int)]) => Unit): Unit = {
    val backends = (0 until n).map { i =>
      val dir = Files.createTempDirectory(s"router-shard$i").toFile
      val engine = new LynxEngine(SparkFixture.spark, dir, 1024 * 1024)
      val srv = new LynxServer(engine, "127.0.0.1", 0)
      srv.start()
      (s"s$i", srv, srv.boundPort)
    }
    val router = new ShardRouter("127.0.0.1", 0,
      backends.map { case (name, _, port) =>
        name -> s"http://127.0.0.1:$port"
      })
    router.start()
    try f(router, backends)
    finally {
      router.stop()
      backends.foreach(_._2.stop())
    }
  }

  test("writes route stably by namespace and queries scope to the " +
    "owning engine — the other shards never see the data") {
    withCluster(3) { (router, backends) =>
      val rp = router.boundPort
      val namespaces = (0 until 12).map(i => s"ns$i")
      namespaces.zipWithIndex.foreach { case (ns, i) =>
        val w = post(rp, "/api/v1/write",
          s"""{"namespace":"$ns","measurement":"cpu","value":"v$i",
             |"metadata":{},"timestamp":${i + 1}}""".stripMargin)
        assert(w.statusCode() == 200, s"write $ns: ${w.body()}")
      }
      namespaces.zipWithIndex.foreach { case (ns, i) =>
        // via the router: the namespace resolves wherever it lives
        val q = post(rp, "/api/v1/query",
          s"""{"namespace":"$ns","query":"SELECT value FROM cpu",
             |"format":"json"}""".stripMargin)
        assert(q.statusCode() == 200 && q.body().contains(s"v$i"),
          s"$ns via router: ${q.statusCode()} ${q.body()}")
        // directly: ONLY the owner has it (placement is real, not
        // fan-out-and-merge)
        val (owner, _) = router.shardFor(ns)
        backends.foreach { case (name, _, port) =>
          val direct = post(port, "/api/v1/query",
            s"""{"namespace":"$ns","query":"SELECT value FROM cpu",
               |"format":"json"}""".stripMargin)
          if (name == owner)
            assert(direct.statusCode() == 200, s"$ns on owner $name")
          else
            assert(direct.statusCode() == 404,
              s"$ns must be absent from non-owner $name")
        }
      }
      // routing is deterministic: the probe endpoint agrees with the
      // in-process function
      namespaces.foreach { ns =>
        val probe = post(rp, "/api/v1/shard",
          s"""{"namespace":"$ns"}""")
        assert(probe.statusCode() == 200 &&
          probe.body().contains(s""""shard":"${router.shardFor(ns)._1}""""))
      }
      // all three shards got some namespace (rendezvous spreads)
      val owners = namespaces.map(ns => router.shardFor(ns)._1).toSet
      assert(owners.size > 1, s"12 namespaces all on one shard? $owners")
    }
  }

  test("adding a shard moves exactly the rendezvous-predicted " +
    "namespace set, every move lands ON the new shard (the " +
    "q_shard_rendezvous invariant at the serving layer)") {
    val old = (0 until 3).map(i => s"s$i" -> s"http://unused-$i")
    val grown = old :+ ("s3" -> "http://unused-3")
    val keys = (0 until 2000).map(i => s"ns$i")
    val moved = keys.filter(k =>
      ShardRouter.shardFor(k, old)._1 !=
        ShardRouter.shardFor(k, grown)._1)
    // every moved key lands on the NEW shard — no old-to-old churn
    moved.foreach { k =>
      assert(ShardRouter.shardFor(k, grown)._1 == "s3",
        s"$k moved between OLD shards — rendezvous violated")
    }
    // the moved fraction is ~1/4 (E = 1/(N+1)); generous band
    val frac = moved.size.toDouble / keys.size
    assert(frac > 0.15 && frac < 0.35,
      s"moved fraction $frac outside the 1/(N+1) band")
    // unmoved keys keep their exact old owner
    keys.filterNot(moved.toSet).foreach { k =>
      assert(ShardRouter.shardFor(k, old)._1 ==
        ShardRouter.shardFor(k, grown)._1)
    }
  }

  test("cross-shard write batches are rejected 422 (never half-" +
    "applied); single-shard batches pass through atomically") {
    withCluster(3) { (router, _) =>
      val rp = router.boundPort
      // find two namespaces on different shards
      val nss = (0 until 50).map(i => s"batch-ns$i")
      val byShard = nss.groupBy(ns => router.shardFor(ns)._1)
      val (aShard, aNss) = byShard.head
      val bNss = byShard.find(_._1 != aShard).get._2
      def w(ns: String, i: Int) =
        s"""{"namespace":"$ns","measurement":"m","value":"v$i",
           |"metadata":{},"timestamp":$i}""".stripMargin
      // cross-shard batch: rejected whole
      val cross = post(rp, "/api/v1/write",
        s"[${w(aNss.head, 1)},${w(bNss.head, 2)}]")
      assert(cross.statusCode() == 422 &&
        cross.body().contains("split write batches"),
        s"${cross.statusCode()} ${cross.body()}")
      // nothing landed from the rejected batch
      val check = post(rp, "/api/v1/query",
        s"""{"namespace":"${aNss.head}","query":"SELECT * FROM m"}""")
      assert(check.statusCode() == 404,
        "a rejected cross-shard batch must apply NOTHING")
      // same-shard multi-namespace batch: allowed, atomic engine-side
      val sameShard = aNss.take(2)
      val ok = post(rp, "/api/v1/write",
        s"[${w(sameShard(0), 1)},${w(sameShard(1), 2)}]")
      assert(ok.statusCode() == 200, ok.body())
      sameShard.foreach { ns =>
        assert(post(rp, "/api/v1/query",
          s"""{"namespace":"$ns","query":"SELECT * FROM m"}""")
          .statusCode() == 200)
      }
    }
  }

  test("health aggregates shards; a down owner fails its namespaces " +
    "502 while other shards keep serving") {
    withCluster(3) { (router, backends) =>
      val rp = router.boundPort
      assert(get(rp, "/health").statusCode() == 200)
      // find namespaces owned by shard s1 and by another shard
      val nss = (0 until 50).map(i => s"hc-ns$i")
      val onS1 = nss.find(ns => router.shardFor(ns)._1 == "s1").get
      val elsewhere = nss.find(ns => router.shardFor(ns)._1 != "s1").get
      Seq(onS1, elsewhere).foreach { ns =>
        assert(post(rp, "/api/v1/write",
          s"""{"namespace":"$ns","measurement":"m","value":"x",
             |"metadata":{},"timestamp":1}""".stripMargin)
          .statusCode() == 200)
      }
      // kill s1
      backends.find(_._1 == "s1").get._2.stop()
      val h = get(rp, "/health")
      assert(h.statusCode() == 503 && h.body().contains("\"s1\":false"),
        s"${h.statusCode()} ${h.body()}")
      // s1's namespace: 502 with the owner named; others: fine
      val dead = post(rp, "/api/v1/query",
        s"""{"namespace":"$onS1","query":"SELECT * FROM m"}""")
      assert(dead.statusCode() == 502 && dead.body().contains("s1"),
        s"${dead.statusCode()} ${dead.body()}")
      val alive = post(rp, "/api/v1/query",
        s"""{"namespace":"$elsewhere","query":"SELECT * FROM m"}""")
      assert(alive.statusCode() == 200,
        s"${alive.statusCode()} ${alive.body()}")
    }
  }

  test("checkpoint broadcasts to every shard: each engine's buffered " +
    "rows survive via its own WAL-truncation carry-over") {
    withCluster(2) { (router, backends) =>
      val rp = router.boundPort
      // write one row per shard (find a namespace for each)
      val nss = (0 until 20).map(i => s"cp-ns$i")
      val perShard = backends.map { case (name, _, _) =>
        nss.find(ns => router.shardFor(ns)._1 == name).get
      }
      perShard.foreach { ns =>
        assert(post(rp, "/api/v1/write",
          s"""{"namespace":"$ns","measurement":"m","value":"x",
             |"metadata":{},"timestamp":1}""".stripMargin)
          .statusCode() == 200)
      }
      // engines here have NO tier: checkpoint is a no-op 200 (the
      // reference-faithful contract) — the broadcast must still fan
      // out and aggregate
      val cp = post(rp, "/api/v1/admin/checkpoint", "")
      assert(cp.statusCode() == 200, cp.body())
      perShard.foreach { ns =>
        assert(post(rp, "/api/v1/query",
          s"""{"namespace":"$ns","query":"SELECT * FROM m"}""")
          .statusCode() == 200)
      }
    }
  }
}
