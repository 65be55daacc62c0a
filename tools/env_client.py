#!/usr/bin/env python3
"""External join-order policy client for graft.plans.EnvServer.

The out-of-process half of the reference's defining RL topology (a
Python trainer process driving the planner environment over a socket,
ZeroMQServer.java:56-311) — newline-delimited JSON over plain TCP,
stdlib only.

Two modes:

  env_client.py PORT            — ONE greedy episode (previewCost every
      action, first argmin — the same tie-break as
      JoinOrderEnv.greedyRollout); prints the episode result as one
      JSON line for the forking process (tools/EnvClientDemo) to
      compare against the in-process rollout.

  env_client.py PORT train N    — a TRAINING loop: N seeded random
      episodes over the bridge (the reference trainer's exploration
      shape — episodes of random edge picks, RLJoinOrderRule.java
      reset/step), remember the best action sequence, then REPLAY it
      and report both costs. Replay-equals-best asserts cross-process
      reset/step determinism, the property any external trainer relies
      on.
"""
import json
import random
import socket
import sys


class Env:
    def __init__(self, port: int) -> None:
        sock = socket.create_connection(("127.0.0.1", port))
        self.sock = sock
        self.rfile = sock.makefile("r", encoding="utf-8")
        self.wfile = sock.makefile("w", encoding="utf-8")

    def call(self, **req):
        self.wfile.write(json.dumps(req) + "\n")
        self.wfile.flush()
        resp = json.loads(self.rfile.readline())
        if not resp.get("ok"):
            raise RuntimeError(f"server error for {req}: {resp}")
        return resp

    def close(self) -> None:
        self.call(cmd="close")
        self.sock.close()


def greedy_episode(env: Env) -> dict:
    env.call(cmd="reset")
    graph = env.call(cmd="getQueryGraph")
    steps = 0
    while not env.call(cmd="isDone")["done"]:
        actions = env.call(cmd="getActions")["actions"]
        costs = [env.call(cmd="previewCost", action=i)["cost"]
                 for i in range(len(actions))]
        best = min(range(len(actions)), key=lambda i: costs[i])
        env.call(cmd="step", action=best)
        steps += 1
    return {
        "totalCost": env.call(cmd="getTotalCost")["totalCost"],
        "joinOrder": env.call(cmd="getJoinOrder")["joinOrder"],
        "steps": steps,
        "relations": graph["relations"],
    }


def run_sequence(env: Env, seq) -> float:
    env.call(cmd="reset")
    for a in seq:
        env.call(cmd="step", action=a)
    assert env.call(cmd="isDone")["done"]
    return env.call(cmd="getTotalCost")["totalCost"]


def train(env: Env, episodes: int) -> dict:
    rng = random.Random(17)
    best_cost, best_seq, costs = float("inf"), None, []
    for _ in range(episodes):
        env.call(cmd="reset")
        seq = []
        while not env.call(cmd="isDone")["done"]:
            n = len(env.call(cmd="getActions")["actions"])
            a = rng.randrange(n)
            env.call(cmd="step", action=a)
            seq.append(a)
        cost = env.call(cmd="getTotalCost")["totalCost"]
        costs.append(cost)
        if cost < best_cost:
            best_cost, best_seq = cost, seq
    replayed = run_sequence(env, best_seq)
    return {
        "episodes": episodes,
        "bestCost": best_cost,
        "replayedCost": replayed,
        "meanCost": sum(costs) / len(costs),
        "bestSeq": best_seq,
    }


def main() -> None:
    env = Env(int(sys.argv[1]))
    if len(sys.argv) > 2 and sys.argv[2] == "train":
        result = train(env, int(sys.argv[3]) if len(sys.argv) > 3 else 20)
    else:
        result = greedy_episode(env)
    env.close()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
