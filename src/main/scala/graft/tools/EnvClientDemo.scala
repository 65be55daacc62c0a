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
    try {
      val pb = new ProcessBuilder(
        "python3", "tools/env_client.py", server.boundPort.toString)
      pb.redirectErrorStream(false)
      val proc = pb.start()
      val out = new String(proc.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim
      val err = new String(proc.getErrorStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      val rc = proc.waitFor()
      require(rc == 0, s"client process failed (rc=$rc): $err")

      val result = new ObjectMapper().readTree(out)
      val clientCost = result.get("totalCost").asDouble()
      val clientOrder = result.get("joinOrder").asText()
      println(s"client pid crossed a real process boundary: " +
        s"pid=${proc.pid()} (server jvm pid=${ProcessHandle.current().pid()})")
      println(s"client episode:    cost=$clientCost steps=" +
        s"${result.get("steps").asInt()} order=$clientOrder")
      println(s"in-process greedy: cost=$expected")
      require(clientCost == expected,
        s"external episode cost $clientCost != in-process $expected")
      require(result.get("steps").asInt() == cq.graph.n - 1,
        "episode must take n-1 join steps")
      println("EXTERNAL CLIENT == IN-PROCESS ROLLOUT OK")
    } finally server.close()
  }
}
