"""Command-line entry: multi-agent SLAM launcher.

Keeps the reference CLI contract (`/root/reference/multi_agents.py:15-62`):

    python -m mneslam_tpu.cli --config configs/Replica/room0.yaml \
        --num_agents 2 [--output OUT] [--mode slam|mapping]

For N > 1 agents, per-agent configs are derived by the `_agent{rank}.yaml`
suffix convention (multi_agents.py:45) when such files exist, else by
splitting the trajectory evenly. Agents run as a deterministic in-process
interleave over InMemoryComms (SURVEY.md §5.8) — `--file_comms` switches to
the reference's on-disk exchange protocol, and `--spawn` launches each agent
as its own OS process over that protocol (the reference's
`mp.Process`-per-agent deployment, multi_agents.py:44-49).
"""

from __future__ import annotations

import argparse
import os


def derive_agent_config(config_path: str, rank: int) -> str:
    base, ext = os.path.splitext(config_path)
    cand = f"{base}_agent{rank}{ext}"
    return cand if os.path.exists(cand) else config_path


def _spawn_processes(args):
    """Reference-parity multi-process launch (`multi_agents.py:44-49`):
    one OS process per agent, exchanging through the on-disk FileComms
    protocol. Each child runs its own SLAM loop at its own pace and polls
    the shared output tree for foreign descriptors/keyframes/checkpoints —
    the same lock-free asynchrony as the reference's spawned workers (a
    late-finishing peer's final checkpoint may miss another agent's
    end-of-run fusion pass, exactly as in the reference)."""
    import subprocess
    import sys

    cmd_base = [sys.executable, "-m", "mneslam_tpu.cli",
                "--config", args.config,
                "--num_agents", str(args.num_agents), "--spawn"]
    if args.output:
        cmd_base += ["--output", args.output]
    if args.mode:
        cmd_base += ["--mode", args.mode]
    if args.resume:
        cmd_base += ["--resume", args.resume]

    procs = []
    for rank in range(args.num_agents):
        print(f"spawning agent {rank}/{args.num_agents} ...", flush=True)
        procs.append(subprocess.Popen(cmd_base + ["--spawn_rank", str(rank)]))
    codes = [p.wait() for p in procs]
    for rank, rc in enumerate(codes):
        print(f"agent {rank}: exit {rc}")
    if any(codes):
        raise SystemExit(f"agent process failed: exit codes {codes}")
    return codes


def main(argv=None):
    ap = argparse.ArgumentParser(description="MNESLAM-TPU multi-agent SLAM")
    ap.add_argument("--config", required=True)
    ap.add_argument("--num_agents", "--num_gpus", type=int, default=1,
                    dest="num_agents")
    ap.add_argument("--output", default=None)
    ap.add_argument("--mode", choices=["slam", "mapping"], default=None)
    ap.add_argument("--file_comms", action="store_true")
    ap.add_argument("--spawn", action="store_true",
                    help="launch each agent as its own OS process over the "
                         "on-disk FileComms protocol (the reference's "
                         "multi_agents.py:44-49 deployment mode; one process "
                         "per host/accelerator — select the device per child "
                         "via the environment, e.g. JAX_PLATFORMS / TPU "
                         "visible-device vars, as the reference does with "
                         "CUDA_VISIBLE_DEVICES)")
    ap.add_argument("--spawn_rank", type=int, default=None,
                    help=argparse.SUPPRESS)  # internal: child process rank
    ap.add_argument("--device_mesh", action="store_true",
                    help="run agents as device-mesh slices: stacked map "
                         "states, one sharded super-step per round, "
                         "collective descriptor/checkpoint exchange "
                         "(mapping mode)")
    ap.add_argument("--resume", default=None,
                    help="full-state checkpoint to restore before running")
    args = ap.parse_args(argv)

    if args.spawn and args.num_agents > 1 and args.spawn_rank is None:
        return _spawn_processes(args)

    from .agents.comms import FileComms, InMemoryComms
    from .agents.runner import MultiAgentRunner
    from .config import default_config, deep_update, load_config
    from .data.datasets import get_dataset
    from .slam import MNESLAM

    ranks = (list(range(args.num_agents)) if args.spawn_rank is None
             else [args.spawn_rank])
    agents = []
    for rank in ranks:
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

    if args.file_comms or args.spawn_rank is not None:
        out = os.path.join(agents[0].config["data"]["output"],
                           agents[0].config["data"]["exp_name"])
        comms = FileComms(out, rank=ranks[0])
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

    for rank, r in zip(ranks, results):
        print(f"agent {rank}: {r}")
    return results


if __name__ == "__main__":
    main()
