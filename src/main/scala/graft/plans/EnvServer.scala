package graft.plans

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/** External-policy bridge over [[JoinOrderEnv]]: the reference's
  * ZeroMQServer request/response vocabulary (reset / step / getReward /
  * isDone / getActions / getQueryGraph, ZeroMQServer.java:101-269) as a
  * newline-delimited-JSON TCP service — an external agent (the
  * reference's Python RL trainer shape) drives episodes over a plain
  * socket.
  *
  * Deliberate deviations from the reference, both documented in
  * SURVEY.md §5: plain JDK TCP instead of ZMQ (zero extra dependencies —
  * the protocol is the same lockstep request/reply REP pattern), and
  * JSON instead of ZMQ multipart strings. Like the reference's server it
  * is single-client lockstep: one in-flight episode, one request at a
  * time.
  *
  * Wire protocol: one JSON object per line in, one per line out.
  *   {"cmd":"reset"}                → {"ok":true}
  *   {"cmd":"getActions"}           → {"ok":true,"actions":[[i,j],...]}
  *   {"cmd":"step","action":0}      → {"ok":true,"reward":-123.0}
  *   {"cmd":"previewCost","action":0} → {"ok":true,"cost":123.0}
  *   {"cmd":"getReward"}            → {"ok":true,"reward":-123.0}
  *   {"cmd":"isDone"}               → {"ok":true,"done":false}
  *   {"cmd":"getTotalCost"}         → {"ok":true,"totalCost":456.0}
  *   {"cmd":"getJoinOrder"}         → {"ok":true,"joinOrder":"JOIN (...)"}
  *   {"cmd":"getQueryGraph"}        → {"ok":true,"relations":[...],"edges":[[a,b],...]}
  *   {"cmd":"close"}                → {"ok":true} and the connection ends
  * Errors: {"ok":false,"error":"..."} (the episode survives; the
  * reference hard-exits instead, ZeroMQServer.java:263-268).
  */
final class EnvServer(g: QueryGraph, env: JoinOrderEnv, port: Int = 0) {

  private val server = new ServerSocket(port)
  @volatile private var running = true

  /** Bound port (useful with port = 0 / ephemeral). */
  def boundPort: Int = server.getLocalPort

  private val thread = new Thread(() => acceptLoop(), "graft-env-server")
  thread.setDaemon(true)
  thread.start()

  private def acceptLoop(): Unit =
    while (running) {
      try {
        val client = server.accept()
        try serve(client)
        finally client.close()
      } catch {
        case _: java.net.SocketException => // closed during accept
      }
    }

  private def serve(client: Socket): Unit = {
    val mapper = new ObjectMapper()
    val in = new BufferedReader(
      new InputStreamReader(client.getInputStream, StandardCharsets.UTF_8))
    val out = new PrintWriter(
      new java.io.OutputStreamWriter(
        client.getOutputStream, StandardCharsets.UTF_8), true)
    var open = true
    while (open) {
      val line = in.readLine()
      if (line == null) open = false
      else {
        val resp = mapper.createObjectNode()
        try {
          val req = mapper.readTree(line)
          def action: Int = req.get("action").asInt()
          req.get("cmd").asText() match {
            case "reset" =>
              env.reset(); resp.put("ok", true)
            case "getActions" =>
              resp.put("ok", true)
              val arr = resp.putArray("actions")
              env.actions.foreach { case (i, j) =>
                val pair = arr.addArray(); pair.add(i); pair.add(j)
              }
            case "step" =>
              resp.put("ok", true).put("reward", env.step(action))
            case "previewCost" =>
              resp.put("ok", true).put("cost", env.previewCost(action))
            case "getReward" =>
              resp.put("ok", true).put("reward", env.reward)
            case "isDone" =>
              resp.put("ok", true).put("done", env.isDone)
            case "getTotalCost" =>
              resp.put("ok", true).put("totalCost", env.totalCost)
            case "getJoinOrder" =>
              resp.put("ok", true).put("joinOrder", env.finalTree.describe(g))
            case "getQueryGraph" =>
              resp.put("ok", true)
              val rels = resp.putArray("relations")
              g.relations.foreach(rels.add)
              val edges = resp.putArray("edges")
              g.edges.foreach { e =>
                val pair = edges.addArray(); pair.add(e.a); pair.add(e.b)
              }
            // DQ featurization surface (reference: getAttrCount +
            // getQueryGraph feature replies, ZeroMQServer.java:181-205);
            // requires the env to carry an AttributeRegistry
            case "getAttrCount" =>
              resp.put("ok", true).put("attrCount", env.attrCount)
            case "getState" =>
              resp.put("ok", true)
              val fs = resp.putArray("factors")
              env.stateFeatures.foreach { bs =>
                val arr = fs.addArray(); bs.foreach(arr.add)
              }
            case "getActionFeatures" =>
              val (l, r) = env.actionFeatures(action)
              resp.put("ok", true)
              val la = resp.putArray("left"); l.foreach(la.add)
              val ra = resp.putArray("right"); r.foreach(ra.add)
            case "close" =>
              resp.put("ok", true); open = false
            case other =>
              resp.put("ok", false).put("error", s"unknown cmd: $other")
          }
        } catch {
          case e: Exception =>
            resp.removeAll()
            resp.put("ok", false)
              .put("error", s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
        out.println(mapper.writeValueAsString(resp: ObjectNode))
      }
    }
  }

  def close(): Unit = {
    running = false
    server.close()
  }
}
