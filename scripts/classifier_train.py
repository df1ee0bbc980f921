"""Train a noised image classifier (reference scripts/classifier_train.py).

One jitted step: sample t, q_sample-noise the batch, CE loss + top-1/5
accuracy, AdamW — with microbatch accumulation weighted by microbatch size
(classifier_train.py:136). The reference's DDP/no_sync machinery maps to the
jit-sharded step over the data mesh.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from guided_diffusion_clip_tpu.utils.platform import honor_env_platform

honor_env_platform()

import jax
import jax.numpy as jnp
import numpy as np
import optax

from guided_diffusion_clip_tpu.data.image_datasets import load_data
from guided_diffusion_clip_tpu.parallel import dist as pdist
from guided_diffusion_clip_tpu.parallel.mesh import (
    data_sharding,
    host_local_part,
    replicated,
    constrain_tree,
    create_data_mesh,
    fsdp_sharding_tree,
    replicate,
    shard_batch,
    shard_tree,
)
from guided_diffusion_clip_tpu.training.resample import create_named_schedule_sampler
from guided_diffusion_clip_tpu.training.train_loop import get_blob_logdir
from guided_diffusion_clip_tpu.utils import checkpoint as ckpt
from guided_diffusion_clip_tpu.utils import logger
from guided_diffusion_clip_tpu.utils.script_util import (
    add_dict_to_argparser,
    args_to_dict,
    classifier_and_diffusion_defaults,
    create_classifier_and_diffusion,
    parse_yaml,
)


def compute_top_k(logits, labels, k):
    """classifier_train.py:185-191."""
    top = np.argsort(np.asarray(logits), axis=-1)[:, -k:]
    return float((top == np.asarray(labels)[:, None]).any(axis=-1).mean())


def main():
    args = create_argparser().parse_args()
    args = parse_yaml(args)

    from guided_diffusion_clip_tpu.utils.checkpoint import setup_compilation_cache

    setup_compilation_cache()
    pdist.setup_dist()
    logger.configure(args=args)

    logger.log("creating model and diffusion...")
    model, diffusion = create_classifier_and_diffusion(
        **args_to_dict(args, classifier_and_diffusion_defaults().keys())
    )
    schedule_sampler = create_named_schedule_sampler(
        args.schedule_sampler, diffusion.num_timesteps
    )

    logger.log("creating data loader...")
    data = load_data(
        data_dir=args.data_dir,
        batch_size=args.batch_size,
        image_size=args.image_size,
        class_cond=True,
        class_cond_from_filenames=True,
        random_crop=True,
    )
    val_data = (
        load_data(
            data_dir=args.val_data_dir,
            batch_size=args.batch_size,
            image_size=args.image_size,
            class_cond=True,
            class_cond_from_filenames=True,
        )
        if args.val_data_dir
        else None
    )

    B = args.batch_size  # per-process, like the reference's per-rank batch
    world = max(1, jax.process_count())
    if args.spatial_shard and args.spatial_shard > 1:
        # DP x SP: shard each image's H over a 'space' axis (parallel/sp.py)
        from guided_diffusion_clip_tpu.parallel import sp
        from guided_diffusion_clip_tpu.parallel.mesh import create_mesh

        n, s = len(jax.devices()), args.spatial_shard
        assert n % s == 0, f"--spatial_shard {s} does not divide {n} devices"
        assert (B * world) % (n // s) == 0, (
            f"global batch {B * world} does not shard over data axis {n // s}"
        )
        mesh = create_mesh(axes=(("data", n // s), ("space", s)))
        sp.set_spatial_sharding(mesh)
    elif args.tensor_shard and args.tensor_shard > 1:
        # DP x TP: shard each activation's C over a 'model' axis (parallel/tp.py)
        from guided_diffusion_clip_tpu.parallel import tp
        from guided_diffusion_clip_tpu.parallel.mesh import create_mesh

        n, s = len(jax.devices()), args.tensor_shard
        assert n % s == 0, f"--tensor_shard {s} does not divide {n} devices"
        assert (B * world) % (n // s) == 0, (
            f"global batch {B * world} does not shard over data axis {n // s}"
        )
        mesh = create_mesh(axes=(("data", n // s), ("model", s)))
        tp.set_tensor_sharding(mesh)
    else:
        mesh = create_data_mesh(B * world)
    shape = (B, args.image_size, args.image_size, 3)
    # jitted init: unjitted flax init dispatches op-by-op (pathological on
    # remote-compile TPU toolchains, ~100s even for small models)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros(shape), jnp.zeros((B,))
    )["params"]
    resume_step = 0
    if args.resume_checkpoint:
        resume_step = ckpt.parse_resume_step_from_filename(args.resume_checkpoint)
        logger.log(f"loading model from checkpoint: {args.resume_checkpoint}... ({resume_step})")
        params = ckpt.load_params(
            args.resume_checkpoint, params, model="encoder", pool=args.classifier_pool
        )

    if args.anneal_lr:
        schedule = lambda step: args.lr * jnp.maximum(0.0, 1.0 - step / args.iterations)
    else:
        schedule = args.lr
    opt = optax.adamw(learning_rate=schedule, weight_decay=args.weight_decay)
    opt_state = opt.init(params)
    if args.param_sharding == "fsdp":
        # with an SP 'space' axis, spread shards over the whole pool
        fsdp_axes = ("data", "space") if "space" in mesh.axis_names else "data"
        param_shd = fsdp_sharding_tree(mesh, params, fsdp_axes)
        opt_shd = fsdp_sharding_tree(mesh, opt_state, fsdp_axes)
        params = shard_tree(params, param_shd)
        opt_state = shard_tree(opt_state, opt_shd)
    else:
        param_shd = opt_shd = None
        params = replicate(mesh, params)
        opt_state = replicate(mesh, opt_state)

    micro = args.microbatch if args.microbatch > 0 else B
    n_micro = B // micro
    micro_g = micro * world  # the jitted step sees the GLOBAL batch
    B_g = B * world
    noised = args.noised

    def loss_of_microbatch(p, x, y, t, rng):
        if noised:
            noise = jax.random.normal(rng, x.shape, x.dtype)
            x = diffusion.q_sample(x, t, noise)
        logits = model.apply({"params": p}, x, t, train=True, rngs={"dropout": rng})
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        # microbatch scaling len(sub)/len(batch) (classifier_train.py:136):
        # accumulated microbatch grads then sum to the full-batch mean.
        return ce.mean() * (micro / B), (ce, logits)  # micro/B == micro_g/B_g

    def train_step(p, o, batch, labels, t, rng):
        # ZeRO-3 structure (same as TrainLoop): compute with params
        # constrained REPLICATED (one hoisted all-gather) so batch-sharded
        # activations never meet dimension-sharded weights mid-layer; grads
        # and the optimizer state stay pinned to the FSDP spec.
        if param_shd is not None:
            rep = replicated(mesh)
            compute_p = constrain_tree(
                p, jax.tree_util.tree_map(lambda _: rep, p)
            )
        else:
            compute_p = p

        def split(x):
            return x.reshape((n_micro, micro_g) + x.shape[1:])

        xs, ys, ts = split(batch), split(labels), split(t)
        rngs = jax.random.split(rng, n_micro)

        def body(acc, inp):
            x, y, tt, r = inp
            (loss, (ce, logits)), grads = jax.value_and_grad(loss_of_microbatch, has_aux=True)(compute_p, x, y, tt, r)
            acc = jax.tree_util.tree_map(jnp.add, acc, grads)
            if param_shd is not None:
                acc = constrain_tree(acc, param_shd)  # reduce-scattered grads
            return acc, (ce, logits)

        zero = jax.tree_util.tree_map(jnp.zeros_like, p)
        if param_shd is not None:
            zero = constrain_tree(zero, param_shd)
        grads, (ces, logits) = jax.lax.scan(body, zero, (xs, ys, ts, rngs))
        updates, o = opt.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        if param_shd is not None:
            p = constrain_tree(p, param_shd)
            o = constrain_tree(o, opt_shd)
        con = jax.lax.with_sharding_constraint
        vec_shd = data_sharding(mesh)
        ces_out = con(ces.reshape(-1), vec_shd)
        logits_out = con(logits.reshape((B_g,) + logits.shape[2:]), vec_shd)
        return p, o, ces_out, logits_out

    train_step = jax.jit(train_step, donate_argnums=(0, 1))
    eval_logits = jax.jit(
        lambda p, x, t: jax.lax.with_sharding_constraint(
            model.apply({"params": p}, x, t), data_sharding(mesh)
        )
    )

    logger.log(f"training classifier for {args.iterations} iterations...")
    rng = jax.random.key(0)
    np_rng = np.random.default_rng(jax.process_index())

    # Deferred metric logging (same scheme as TrainLoop.flush_metrics): fetch
    # step k's (ces, logits) in one device_get while step k+1 runs on device,
    # instead of serializing three scalar/array reads into every step.
    pending = None

    def flush_pending():
        nonlocal pending
        if pending is None:
            return
        labels_p, ces_p, logits_p = pending
        pending = None
        # each process reads back exactly ITS batch rows (aligned with the
        # local labels by shard_batch/host_local_part construction)
        ces_np, logits_np = host_local_part(ces_p), host_local_part(logits_p)
        logger.logkv_mean("loss", float(ces_np.mean()))
        logger.logkv_mean("acc@1", compute_top_k(logits_np, labels_p, 1))
        logger.logkv_mean("acc@5", compute_top_k(logits_np, labels_p, 5))

    for step in range(args.iterations - resume_step):
        cur = step + resume_step
        logger.logkv("step", cur)
        logger.logkv("samples", (cur + 1) * args.batch_size * max(1, jax.process_count()))
        batch, cond = next(data)
        labels = cond["y"]
        if noised:
            t_np, _ = schedule_sampler.sample(B, np_rng)
        else:
            t_np = np.zeros((B,), np.int32)
        rng, step_rng = jax.random.split(rng)
        b = shard_batch(mesh, jnp.asarray(batch))
        y = shard_batch(mesh, jnp.asarray(labels))
        t = shard_batch(mesh, jnp.asarray(t_np))
        params, opt_state, ces, logits = train_step(params, opt_state, b, y, t, step_rng)
        flush_pending()
        pending = (labels, ces, logits)

        if val_data is not None and not cur % args.eval_interval:
            vb, vcond = next(val_data)
            vt = np.zeros((B,), np.int32)
            vlogits = host_local_part(
                eval_logits(params, shard_batch(mesh, jnp.asarray(vb)),
                            shard_batch(mesh, jnp.asarray(vt)))
            )
            vce = optax.softmax_cross_entropy_with_integer_labels(
                jnp.asarray(vlogits), jnp.asarray(vcond["y"])
            )
            logger.logkv_mean("val_loss", float(np.asarray(vce).mean()))
            logger.logkv_mean("val_acc@1", compute_top_k(vlogits, vcond["y"], 1))
            logger.logkv_mean("val_acc@5", compute_top_k(vlogits, vcond["y"], 5))

        if not cur % args.log_interval:
            flush_pending()  # include this step in the dump
            logger.dumpkvs()
        if cur and not (cur + 1) % args.save_interval:
            # ALL ranks enter: under multi-host FSDP the save gathers
            # collectively (gather_to_host); only the primary writes
            if pdist.is_primary():
                logger.log("saving model...")
            save_model(params, opt_state, cur)
            if os.environ.get("DIFFUSION_TRAINING_TEST", ""):
                break

    flush_pending()
    if pdist.is_primary():
        logger.log("saving final model...")
    save_model(params, opt_state, args.iterations - 1)
    pdist.barrier("classifier_train")


def save_model(params, opt_state, step):
    """Collective-safe: every process gathers (required when state is
    sharded across hosts), the primary writes (train_util.py:176-182)."""
    out = get_blob_logdir()
    for name, tree in (
        (ckpt.checkpoint_name("model", step), params),
        (ckpt.checkpoint_name("opt", step), opt_state),
    ):
        host_tree = ckpt.gather_to_host(tree)
        if pdist.is_primary():
            ckpt.save_flax(os.path.join(out, name), host_tree)


def create_argparser():
    defaults = dict(
        data_dir="",
        val_data_dir="",
        main_path="",
        noised=True,
        iterations=150000,
        lr=3e-4,
        weight_decay=0.0,
        anneal_lr=False,
        batch_size=4,
        microbatch=-1,
        schedule_sampler="uniform",
        resume_checkpoint="",
        log_interval=10,
        eval_interval=5,
        save_interval=10000,
        param_sharding="replicated",  # "fsdp" shards params/opt over the data axis
        spatial_shard=0,  # >1: shard activation H over a 'space' mesh axis (SP)
        tensor_shard=0,  # >1: shard activation C over a 'model' mesh axis (TP)
    )
    defaults.update(classifier_and_diffusion_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


if __name__ == "__main__":
    main()
