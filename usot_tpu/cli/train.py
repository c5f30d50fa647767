"""Training CLI (ref: scripts/train_usot.py).

Epoch loop with the reference schedule: naive Siamese until MEMORY_EPOCH,
cycle memory after; backbone (layer1-3) unfrozen at UNFIX_EPOCH; warmup +
log LR decay; checkpoints from epoch 5. Data parallel over all local TPU
devices via a 1-D mesh.
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from usot_tpu.config.defaults import load_config
from usot_tpu.data.dataset import USOTDataset
from usot_tpu.data.loader import DataLoader
from usot_tpu.models.usot import build_usot, init_variables
from usot_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
from usot_tpu.train.checkpoint import (peek_epoch, restore_checkpoint,
                                       save_model_epoch)
from usot_tpu.train.optim import build_optimizer
from usot_tpu.train.schedulers import build_lr_spaces
from usot_tpu.train.step import TrainState, epoch_weights, make_train_step
from usot_tpu.utils.meters import AverageMeter, create_logger, print_speed


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Train USOT-TPU")
    parser.add_argument("--cfg", default="experiments/train/USOT.yaml")
    parser.add_argument("--workers", type=int, default=None)
    parser.add_argument("--devices", type=int, default=None,
                        help="number of TPU devices for DP")
    parser.add_argument("--shards", default=None,
                        help="shard-cache root (see cli.make_shards); "
                        "epochs with a prebuilt epoch_XXX dir stream "
                        "from disk, others fall back to the live loader")
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="model compute dtype (params stay f32). "
                        "bfloat16 is ~1.66x faster on TPU with loss "
                        "trajectories within ~1.6%% of f32 "
                        "(tools/bf16_train_parity.py; PERF_NOTES.md)")
    parser.add_argument("--accum", type=int, default=1,
                        help="gradient-accumulation microbatches per "
                        "step: k-fold effective batch at 1/k activation "
                        "HBM (per-chip batch must divide by k)")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize the forward in backprop "
                        "(jax.checkpoint): ~half peak activation HBM "
                        "for one extra forward pass")
    parser.add_argument("--resume", default=None,
                        help="checkpoint_eN.ckpt to resume from "
                        "(continues at epoch N+1; overrides TRAIN.RESUME)")
    parser.add_argument("--stop-after-epoch", type=int, default=None,
                        help="stop (cleanly) after this epoch completes, "
                        "WITHOUT altering the schedule: unlike lowering "
                        "END_EPOCH, the LR decay / lambda / cls_ratio "
                        "spaces stay built for the full run, so a later "
                        "--resume continues the same trajectory "
                        "(maintenance-window stop; also how the "
                        "interrupt/resume tests emulate a kill)")
    return parser.parse_args(argv)


def main(argv=None):
    from usot_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    args = parse_args(argv)
    cfg = load_config(args.cfg if os.path.exists(args.cfg) else None)
    if args.workers:
        cfg.WORKERS = args.workers
    tc = cfg.USOT.TRAIN

    logger, log_dir = create_logger(cfg.OUTPUT_DIR, "USOT", "train")
    logger.info("config: %s", cfg)

    try:
        from tensorboardX import SummaryWriter
        writer = SummaryWriter(log_dir=os.path.join(log_dir, "tb"))
    except Exception:
        writer = None

    n_dev = args.devices or len(jax.devices())
    mesh = make_mesh(n_data=n_dev)
    logger.info("devices: %d (mesh %s)", n_dev, mesh.shape)

    model = build_usot(mem_size=tc.MEMORY_NUM,
                       width=tc.WIDTH, channels=tc.CHANNELS,
                       dtype=jnp.bfloat16 if args.dtype == "bfloat16"
                       else jnp.float32)
    variables = init_variables(model, jax.random.PRNGKey(0))

    pretrain_path = os.path.join("pretrain", tc.PRETRAIN)
    if os.path.exists(pretrain_path):
        from usot_tpu.models.convert import load_pretrain
        variables = load_pretrain(variables, pretrain_path)
        logger.info("loaded pretrain %s", pretrain_path)
    else:
        logger.warning("pretrain %s not found; training from scratch",
                       pretrain_path)

    lr_spaces = build_lr_spaces(tc, tc.END_EPOCH)

    def build_state(params, batch_stats, epoch):
        unfix = epoch >= tc.UNFIX_EPOCH
        tx, _ = build_optimizer(params, tc.MOMENTUM, tc.WEIGHT_DECAY,
                                tc.LAYERS_LR, unfix,
                                tuple(tc.TRAINABLE_LAYER))
        return tx, TrainState(params, batch_stats, tx.init(params))

    resume_path = args.resume or (
        tc.RESUME if isinstance(tc.RESUME, str) else None)
    if resume_path and not os.path.exists(resume_path):
        raise FileNotFoundError(f"--resume checkpoint {resume_path}")

    start_epoch = tc.START_EPOCH
    if resume_path:
        # The optimizer pytree changes structure at UNFIX_EPOCH (frozen
        # leaves become momentum buffers), so the restore target must be
        # built for the CHECKPOINT's stage, not START_EPOCH's.
        start_epoch = peek_epoch(resume_path) + 1
    tx, state = build_state(variables["params"], variables["batch_stats"],
                            start_epoch)
    if resume_path:
        state, _ = restore_checkpoint(resume_path, state)
        logger.info("resumed from %s at epoch %d", resume_path, start_epoch)

    state = replicate_tree(mesh, state)

    # Machine-readable per-epoch record (losses, schedule state, timing),
    # rewritten after every epoch so a killed run leaves a usable partial
    # record for resume verification (see tools/train_full_schedule.py).
    record = {"resumed_from": resume_path, "start_epoch": int(start_epoch),
              "end_epoch": int(tc.END_EPOCH), "epochs": {}}
    record_path = os.path.join(cfg.OUTPUT_DIR, "train_record.json")
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)

    global_step = 0
    # The step program is static in (phase, bn stage, lambda_1); memoize so
    # the 30-epoch schedule compiles each distinct program once instead of
    # re-tracing every epoch (the final log-decay segment alone spans 20+
    # epochs of one identical program). The cache keys include the unfix
    # flag, which is also exactly when tx is rebuilt.
    step_cache: dict = {}
    for epoch in range(start_epoch, tc.END_EPOCH + 1):
        cycle_memory = epoch >= tc.MEMORY_EPOCH
        if epoch == tc.UNFIX_EPOCH:
            logger.info("unfreezing backbone layers %s", tc.TRAINABLE_LAYER)
            tx, new_state = build_state(
                jax.tree.map(np.asarray, state.params),
                jax.tree.map(np.asarray, state.batch_stats), epoch)
            state = replicate_tree(mesh, new_state)

        lambda_1, lambda_total, cls_ratio = epoch_weights(tc, epoch)
        unfix = epoch >= tc.UNFIX_EPOCH
        step_key = (cycle_memory, unfix, float(lambda_1))
        step_fn = step_cache.get(step_key)
        if step_fn is None:
            step_fn = make_train_step(
                model, tx, cycle_memory=cycle_memory,
                stage_bn_train=unfix, lambda_1=lambda_1,
                lambda_total=lambda_total, lambda_1_naive=tc.LAMBDA_1_NAIVE,
                remat=args.remat, accum_steps=args.accum)
            step_cache[step_key] = step_fn

        batch_size = (tc.BATCH_STAGE_2 if cycle_memory else tc.BATCH) * n_dev
        loader = None
        if args.shards:
            from usot_tpu.cli.make_shards import epoch_dir
            from usot_tpu.data.shards import ShardLoader, read_meta
            sdir = epoch_dir(args.shards, epoch)
            smeta = read_meta(sdir)
            if smeta is not None:
                assert smeta["cycle_memory"] == cycle_memory, (
                    f"shard set {sdir} was built for "
                    f"cycle_memory={smeta['cycle_memory']}")
                loader = ShardLoader(sdir, batch_size)
                logger.info("epoch %d streams %d prebuilt samples from %s",
                            epoch, smeta["n_samples"], sdir)
        if loader is None:
            dataset = USOTDataset(cfg, seed=epoch)
            dataset.cycle_memory = cycle_memory
            loader = DataLoader(dataset, batch_size,
                                num_workers=cfg.WORKERS)

        lr = float(lr_spaces[epoch - 1])
        logger.info("epoch %d lr %.6f cycle_memory=%s batch=%d",
                    epoch, lr, cycle_memory, batch_size)

        batch_time = AverageMeter()
        losses = AverageMeter()
        iter_losses = []
        epoch_t0 = time.time()
        end = time.time()
        from usot_tpu.data.shards import device_prefetch
        batches = device_prefetch(loader,
                                  put=lambda b: shard_batch(mesh, b))
        for it, batch in enumerate(batches):
            state, metrics = step_fn(state, batch, jnp.float32(lr),
                                     jnp.float32(cls_ratio))
            loss = float(metrics["loss"])
            iter_losses.append(round(loss, 6))
            losses.update(loss, batch_size)
            batch_time.update(time.time() - end)
            end = time.time()
            global_step += 1
            if writer is not None:
                writer.add_scalar("train_loss", loss, global_step)
            if (it + 1) % cfg.PRINT_FREQ == 0:
                logger.info(
                    "Epoch: [%d][%d/%d] lr: %.6f Batch Time: %.3fs "
                    "CLS_ORI: %.5f CLS_MEM: %.5f REG: %.5f Loss: %.5f",
                    epoch, it + 1, len(loader), lr, batch_time.avg,
                    float(metrics["cls_loss_ori"]),
                    float(metrics["cls_loss_memory"]),
                    float(metrics["reg_loss"]), losses.avg)
                print_speed(global_step, batch_time.avg,
                            tc.END_EPOCH * len(loader), logger)

        host_state = TrainState(jax.tree.map(np.asarray, state.params),
                                jax.tree.map(np.asarray, state.batch_stats),
                                state.opt_state)
        path = save_model_epoch(cfg.CHECKPOINT_DIR, host_state, epoch)
        if path:
            logger.info("saved %s", path)

        record["epochs"][str(epoch)] = {
            "lr": lr, "cycle_memory": bool(cycle_memory),
            "unfix": bool(epoch >= tc.UNFIX_EPOCH),
            "lambda_1": float(lambda_1), "cls_ratio": float(cls_ratio),
            "batch": int(batch_size), "n_iters": len(iter_losses),
            "loss_avg": round(losses.avg, 6), "losses": iter_losses,
            "seconds": round(time.time() - epoch_t0, 3),
            "checkpoint": path,
        }
        import json as _json
        with open(record_path, "w") as f:
            _json.dump(record, f, indent=1)

        if args.stop_after_epoch is not None and \
                epoch >= args.stop_after_epoch:
            logger.info("stopping after epoch %d (--stop-after-epoch)",
                        epoch)
            break

    if writer is not None:
        writer.close()


if __name__ == "__main__":
    main()
