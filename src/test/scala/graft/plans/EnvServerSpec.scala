package graft.plans

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** An external agent drives a full episode over the TCP bridge and must
  * land on exactly the totals the in-process env produces — the bridge
  * adds transport, not semantics. */
class EnvServerSpec extends AnyFunSuite {

  private def star4: QueryGraph = QueryGraph(
    Vector("lineitem", "orders", "part", "supplier"),
    Vector(
      JoinEdge(0, 1, Seq("l_orderkey" -> "o_orderkey")),
      JoinEdge(0, 2, Seq("l_partkey" -> "p_partkey")),
      JoinEdge(0, 3, Seq("l_suppkey" -> "s_suppkey"))))

  private def mkEnv(g: QueryGraph): JoinOrderEnv = {
    val base = Array(1000.0, 250.0, 40.0, 10.0)
    new JoinOrderEnv(g, HeuristicCardinality.uniform(g, base), CostModel.Cout)
  }

  test("greedy episode over the socket == in-process greedy rollout") {
    val g = star4
    // reference rollout computed in-process first
    val expected = JoinOrderEnv.greedyRollout(mkEnv(g))

    val env = mkEnv(g)
    val server = new EnvServer(g, env)
    try {
      val sock = new Socket("127.0.0.1", server.boundPort)
      try {
        val in = new BufferedReader(
          new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
        val out = new PrintWriter(new java.io.OutputStreamWriter(
          sock.getOutputStream, StandardCharsets.UTF_8), true)
        val mapper = new ObjectMapper()
        def call(json: String): com.fasterxml.jackson.databind.JsonNode = {
          out.println(json)
          val resp = mapper.readTree(in.readLine())
          assert(resp.get("ok").asBoolean(), resp.toString)
          resp
        }
        call("""{"cmd":"reset"}""")
        val graph = call("""{"cmd":"getQueryGraph"}""")
        assert(graph.get("relations").size() == 4)
        assert(graph.get("edges").size() == 3)
        var done = false
        while (!done) {
          val n = call("""{"cmd":"getActions"}""").get("actions").size()
          // externally-scripted greedy: preview every action, take argmin
          val best = (0 until n).minBy(a =>
            call(s"""{"cmd":"previewCost","action":$a}""").get("cost").asDouble())
          val r = call(s"""{"cmd":"step","action":$best}""").get("reward").asDouble()
          assert(call("""{"cmd":"getReward"}""").get("reward").asDouble() == r)
          done = call("""{"cmd":"isDone"}""").get("done").asBoolean()
        }
        val total = call("""{"cmd":"getTotalCost"}""").get("totalCost").asDouble()
        assert(total == expected, s"socket episode $total != in-process $expected")
        assert(call("""{"cmd":"getJoinOrder"}""").get("joinOrder").asText()
          .startsWith("JOIN"))
        // error handling: bad command keeps the episode alive
        out.println("""{"cmd":"nonsense"}""")
        val err = mapper.readTree(in.readLine())
        assert(!err.get("ok").asBoolean())
        assert(call("""{"cmd":"isDone"}""").get("done").asBoolean())
        call("""{"cmd":"close"}""")
      } finally sock.close()
    } finally server.close()
  }

  test("featurization commands serve the DQ one-hot space") {
    val g = star4
    val registry = new AttributeRegistry(Seq(
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "orders" -> Seq("o_orderkey"),
      "part" -> Seq("p_partkey"),
      "supplier" -> Seq("s_suppkey")))
    val env = new JoinOrderEnv(g,
      HeuristicCardinality.uniform(g, Array(1000.0, 250.0, 40.0, 10.0)),
      CostModel.Cout, Some(registry))
    val server = new EnvServer(g, env)
    try {
      val sock = new Socket("127.0.0.1", server.boundPort)
      try {
        val in = new BufferedReader(
          new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
        val out = new PrintWriter(new java.io.OutputStreamWriter(
          sock.getOutputStream, StandardCharsets.UTF_8), true)
        val mapper = new ObjectMapper()
        def call(json: String): com.fasterxml.jackson.databind.JsonNode = {
          out.println(json)
          val resp = mapper.readTree(in.readLine())
          assert(resp.get("ok").asBoolean(), resp.toString)
          resp
        }
        call("""{"cmd":"reset"}""")
        assert(call("""{"cmd":"getAttrCount"}""").get("attrCount").asInt() == 6)
        // 4 leaf factors, each a one-hot block over its own attributes
        val state = call("""{"cmd":"getState"}""").get("factors")
        assert(state.size() == 4)
        val af = call("""{"cmd":"getActionFeatures","action":0}""")
        assert(af.get("left").size() > 0 && af.get("right").size() > 0)
      } finally sock.close()
    } finally server.close()
  }
}
