#!/usr/bin/env python3
"""External join-order policy client for graft.plans.EnvServer.

The out-of-process half of the reference's defining RL topology (a
Python trainer process driving the planner environment over a socket,
ZeroMQServer.java:56-311) — newline-delimited JSON over plain TCP,
stdlib only.

Drives ONE full episode with the greedy 1-step-lookahead policy
(previewCost every action, take the first argmin — the same tie-break
as JoinOrderEnv.greedyRollout) and prints the episode result as one
JSON line for the forking process (tools/EnvClientDemo) to compare
against the in-process rollout.

Usage: env_client.py PORT
"""
import json
import socket
import sys


def main() -> None:
    port = int(sys.argv[1])
    sock = socket.create_connection(("127.0.0.1", port))
    rfile = sock.makefile("r", encoding="utf-8")
    wfile = sock.makefile("w", encoding="utf-8")

    def call(**req):
        wfile.write(json.dumps(req) + "\n")
        wfile.flush()
        resp = json.loads(rfile.readline())
        if not resp.get("ok"):
            raise RuntimeError(f"server error for {req}: {resp}")
        return resp

    call(cmd="reset")
    graph = call(cmd="getQueryGraph")
    steps = 0
    while not call(cmd="isDone")["done"]:
        actions = call(cmd="getActions")["actions"]
        costs = [call(cmd="previewCost", action=i)["cost"]
                 for i in range(len(actions))]
        best = min(range(len(actions)), key=lambda i: costs[i])
        call(cmd="step", action=best)
        steps += 1
    total = call(cmd="getTotalCost")["totalCost"]
    order = call(cmd="getJoinOrder")["joinOrder"]
    call(cmd="close")
    sock.close()

    print(json.dumps({
        "totalCost": total,
        "joinOrder": order,
        "steps": steps,
        "relations": graph["relations"],
    }))


if __name__ == "__main__":
    main()
