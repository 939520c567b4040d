"""Command-line entry: multi-agent SLAM launcher.

Keeps the reference CLI contract (`/root/reference/multi_agents.py:15-62`):

    python -m mneslam_tpu.cli --config configs/Replica/room0.yaml \
        --num_agents 2 [--output OUT] [--mode slam|mapping]

For N > 1 agents, per-agent configs are derived by the `_agent{rank}.yaml`
suffix convention (multi_agents.py:45) when such files exist, else by
splitting the trajectory evenly. Agents run as a deterministic in-process
interleave over InMemoryComms (SURVEY.md §5.8) — `--file_comms` switches to
the reference's on-disk exchange protocol.
"""

from __future__ import annotations

import argparse
import os


def derive_agent_config(config_path: str, rank: int) -> str:
    base, ext = os.path.splitext(config_path)
    cand = f"{base}_agent{rank}{ext}"
    return cand if os.path.exists(cand) else config_path


def main(argv=None):
    ap = argparse.ArgumentParser(description="MNESLAM-TPU multi-agent SLAM")
    ap.add_argument("--config", required=True)
    ap.add_argument("--num_agents", "--num_gpus", type=int, default=1,
                    dest="num_agents")
    ap.add_argument("--output", default=None)
    ap.add_argument("--mode", choices=["slam", "mapping"], default=None)
    ap.add_argument("--file_comms", action="store_true")
    ap.add_argument("--device_mesh", action="store_true",
                    help="run agents as device-mesh slices: stacked map "
                         "states, one sharded super-step per round, "
                         "collective descriptor/checkpoint exchange "
                         "(mapping mode)")
    ap.add_argument("--resume", default=None,
                    help="full-state checkpoint to restore before running")
    args = ap.parse_args(argv)

    from .agents.comms import FileComms, InMemoryComms
    from .agents.runner import MultiAgentRunner
    from .config import default_config, deep_update, load_config
    from .data.datasets import get_dataset
    from .slam import MNESLAM

    agents = []
    for rank in range(args.num_agents):
        path = derive_agent_config(args.config, rank) if args.num_agents > 1 else args.config
        cfg = deep_update(default_config(), load_config(path))
        if args.output:
            cfg["data"]["output"] = args.output
        if args.mode:
            cfg["mode"] = args.mode
        dataset = get_dataset(cfg)
        agent = MNESLAM(cfg, dataset, rank=rank, world_size=args.num_agents)
        if args.resume:
            path = args.resume if args.num_agents == 1 else \
                f"{args.resume}.agent{rank}"
            agent.load_full_state(path)
        agents.append(agent)

    if args.device_mesh:
        from .parallel.fleet import MeshAgentFleet

        fleet = MeshAgentFleet(agents)
        if agents[0].mode == "mapping":
            fleet.run_mapping_only()
            results = [a.terminate() for a in agents]
        else:
            # SLAM on the mesh: per-agent tracking, one sharded mapping
            # super-step per round (parallel/fleet.py run_slam)
            results = fleet.run_slam()
        for rank, r in enumerate(results):
            print(f"agent {rank}: {r}")
        return results

    if args.file_comms:
        out = os.path.join(agents[0].config["data"]["output"],
                           agents[0].config["data"]["exp_name"])
        comms = FileComms(out, rank=0)
    else:
        comms = InMemoryComms()

    runner = MultiAgentRunner(agents, comms=comms)

    if agents[0].mode == "mapping":
        runner.run_mapping_only()
        results = [a.terminate() for a in agents]
    else:
        # interleaved multi-agent SLAM: agents advance together so
        # cross-agent loop closure fires mid-run (multi_agents.py:44-49)
        results = runner.run_slam()

    for rank, r in enumerate(results):
        print(f"agent {rank}: {r}")
    return results


if __name__ == "__main__":
    main()
