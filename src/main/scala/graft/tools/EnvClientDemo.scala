// External-process RL-bridge demo: forks tools/env_client.py as a REAL
// second OS process, lets it drive a full greedy episode against
// graft.plans.EnvServer over TCP, and asserts the episode total equals
// the in-process greedy rollout — the reference's defining trainer
// topology (a separate policy process talking to the planner server,
// ZeroMQServer.java:56-311) exercised across an actual process
// boundary, not just a loopback socket in the same JVM
// (EnvServerSpec covers that half).
//
// Usage: runMain graft.tools.EnvClientDemo
package graft.tools

import com.fasterxml.jackson.databind.ObjectMapper
import graft.plans._

object EnvClientDemo {
  def main(args: Array[String]): Unit = {
    // the flagship corpus graph under heuristic cardinalities — no Spark
    // session needed: the env prices trees, it does not execute them
    val cq = ExperimentCorpus.flagship
    val base = Array(5.0, 25.0, 150.0, 1500.0, 6000.0)
    def mkEnv() = new JoinOrderEnv(
      cq.graph, HeuristicCardinality.uniform(cq.graph, base), CostModel.Cout)

    val expected = JoinOrderEnv.greedyRollout(mkEnv())

    val server = new EnvServer(cq.graph, mkEnv())

    /** Fork the client with a bounded wait. stderr is INHERITED (shows
      * in this process's stderr) rather than piped — a piped stderr the
      * parent only drains after stdout can deadlock both processes once
      * the child fills the pipe buffer with a large traceback. stdout is
      * read after exit: the client writes one small JSON line, far under
      * the pipe buffer. */
    // resolve the client script against plausible anchors so the demo
    // does not silently require the repo root as cwd
    val clientScript = Seq("tools/env_client.py", "../tools/env_client.py")
      .map(new java.io.File(_)).find(_.isFile)
      .getOrElse(sys.error(
        "tools/env_client.py not found — run from the repo root"))
      .getPath

    def runClient(extraArgs: String*): String = {
      val pb = new ProcessBuilder(
        (Seq("python3", clientScript, server.boundPort.toString) ++
          extraArgs): _*)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val proc = pb.start()
      val finished = proc.waitFor(180, java.util.concurrent.TimeUnit.SECONDS)
      if (!finished) {
        proc.destroyForcibly()
        sys.error("client process hung (>180s); killed")
      }
      val out = new String(proc.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim
      require(proc.exitValue() == 0,
        s"client process failed (rc=${proc.exitValue()}); see stderr above")
      out
    }

    try {
      val result = new ObjectMapper().readTree(runClient())
      val clientCost = result.get("totalCost").asDouble()
      val clientOrder = result.get("joinOrder").asText()
      println(s"client episode crossed a real process boundary " +
        s"(server jvm pid=${ProcessHandle.current().pid()})")
      println(s"client episode:    cost=$clientCost steps=" +
        s"${result.get("steps").asInt()} order=$clientOrder")
      println(s"in-process greedy: cost=$expected")
      require(clientCost == expected,
        s"external episode cost $clientCost != in-process $expected")
      require(result.get("steps").asInt() == cq.graph.n - 1,
        "episode must take n-1 join steps")
      println("EXTERNAL CLIENT == IN-PROCESS ROLLOUT OK")

      // training mode: 20 random episodes over the bridge, best-sequence
      // replay — cross-process reset/step determinism is the property
      // every external trainer (the reference's Python RL loop) relies on
      val trained = new ObjectMapper().readTree(runClient("train", "20"))
      val best = trained.get("bestCost").asDouble()
      val replayed = trained.get("replayedCost").asDouble()
      val mean = trained.get("meanCost").asDouble()
      val opt = Enumerators.DPccp
        .plan(cq.graph, HeuristicCardinality.uniform(cq.graph, base),
          CostModel.Cout).cost
      println(s"trainer: episodes=20 best=$best replayed=$replayed " +
        s"mean=$mean optimal=$opt")
      require(replayed == best,
        s"replaying the best sequence gave $replayed, recorded $best — " +
          "cross-process reset/step is not deterministic")
      require(best >= opt, "episode cost below the exact optimum?!")
      require(best <= mean, "best-of-N above the mean?!")
      println("EXTERNAL TRAINING LOOP OK (replay deterministic)")
    } finally server.close()
  }
}
