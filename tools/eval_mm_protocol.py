#!/usr/bin/env python
"""Standalone MM-1..4 evaluation CLI.

Reference: tools/eval_mm_protocol.py (the intended protocol, rebuilt on the
unified engine — no bitrotted modality names; one code path with training
eval).  Prints one JSON blob with per-combo mAP/CMC and MM-k aggregates.

Usage:
    python tools/eval_mm_protocol.py --dataset_root /data/orbench \
        --model_path ./checkpoints/best [--cache_dir .eval_cache] \
        [--submission out.csv] [--sample_ratio 1.0]
"""
import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    import jax.numpy as jnp

    from prcv2025reid_tpu.configs import TrainingConfig
    from prcv2025reid_tpu.data.dataset import MultiModalDataset
    from prcv2025reid_tpu.data.tokenizer import build_tokenizer
    from prcv2025reid_tpu.evaluation.protocol import (
        GalleryCache,
        evaluate_protocol,
        export_submission_csv,
    )
    from prcv2025reid_tpu.models.reid_model import MultiModalReIDModel
    from prcv2025reid_tpu.training.checkpoint import restore_checkpoint
    from prcv2025reid_tpu.training.param_groups import build_optimizer
    from prcv2025reid_tpu.training.train_step import (
        TrainState,
        make_combo_embed_step,
        make_weighted_embed_step,
    )
    import jax

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset_root", required=True)
    ap.add_argument("--json_file", default=None)
    ap.add_argument("--model_path", required=True, help="checkpoint dir (contains host_state.json)")
    ap.add_argument("--cache_dir", default="./.eval_cache")
    ap.add_argument("--cache_tag", default="standalone")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--sample_ratio", type=float, default=1.0)
    ap.add_argument("--submission", default=None, help="also export a submission CSV here")
    ap.add_argument(
        "--topk", type=int, default=None,
        help="submission ranking depth; default = checkpoint config.rank_topk",
    )
    ap.add_argument(
        "--fusion_mode", choices=("model", "weighted"), default="model",
        help="query fusion: the model's attention fusion, or the reference "
        "FeatureExtractor's fixed weighted sum (text x1.2, "
        "tools/eval_mm_protocol.py:133-219)",
    )
    ap.add_argument(
        "--block_impl", default=None,
        choices=("xla", "fused", "fused_int8"),
        help="override the trunk compute path for embedding (default = "
        "checkpoint config)",
    )
    ap.add_argument(
        "--attn_backend", default=None,
        choices=("xla", "splash", "onesaug"),
        help="override the attention core for embedding (bench.py ranking-"
        "gates these; 'onesaug' + --gelu_impl=tanh is the measured-fastest "
        "equivalent path on v5e — docs/performance.md round 3)",
    )
    ap.add_argument(
        "--gelu_impl", default=None, choices=("erf", "tanh", "poly"),
        help="override the GELU formulation for embedding",
    )
    ap.add_argument(
        "--token_keep", type=int, default=None,
        help="override eval-path token reduction (0 disables; >0 keeps that "
        "many patch tokens after the checkpoint's token_reduce_layer).  Use "
        "0 to A/B a token-reduce-trained checkpoint against its full-token "
        "embedding; cache tags separate the two paths automatically",
    )
    ap.add_argument(
        "--rerank", action=argparse.BooleanOptionalAction, default=False,
        help="k-reciprocal re-ranking of each query's cosine top-N head "
        "(evaluation/rerank.py; standard ReID mAP booster — the reference "
        "ranks by raw cosine only).  Applies to the metrics AND the "
        "submission CSV; per-combo detail gains mAP_plain for comparison",
    )
    ap.add_argument("--rerank_top_n", type=int, default=100,
                    help="candidate depth re-ranked per query")
    ap.add_argument("--rerank_k1", type=int, default=20,
                    help="reciprocal-neighborhood size k1")
    ap.add_argument("--rerank_k2", type=int, default=6,
                    help="local query-expansion size k2")
    ap.add_argument("--rerank_lambda", type=float, default=0.3,
                    help="weight of the original cosine distance "
                    "(1-lambda on the Jaccard term); 1.0 = plain cosine")
    ap.add_argument(
        "--exclude_same_image",
        action=argparse.BooleanOptionalAction,
        default=True,
        help="--no-exclude_same_image disables the anchor-exclusion protocol",
    )
    ap.add_argument(
        "--distributed", choices=("off", "auto", "on"), default="off",
        help="multi-host eval/submission on a pod: jax.distributed init "
        "before any device use (utils/distributed.py; same semantics as "
        "the train CLI's --distributed)",
    )
    ap.add_argument("--coordinator_address", default=None)
    ap.add_argument("--num_processes", type=int, default=None)
    ap.add_argument("--process_id", type=int, default=None)
    ap.add_argument(
        "--eval_split", choices=("all", "val", "train"), default="all",
        help="'all' evaluates every identity under dataset_root (the "
        "reference tool's behavior — correct for a held-out competition test "
        "root).  'val'/'train' reconstruct the trainer's ID-disjoint split "
        "from the checkpoint config (val_ratio + seed) — use 'val' when "
        "pointing at the TRAINING root so the numbers are comparable to the "
        "trainer's reported metrics (evaluating 'all' there mixes memorized "
        "training identities into gallery+queries and inflates mAP)",
    )
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO)

    # multi-host: must precede the first device query (model init below);
    # argparse Namespace duck-types the config fields the helper reads
    from prcv2025reid_tpu.utils.distributed import initialize_from_config

    initialize_from_config(args)

    # config comes from the checkpoint sidecar so the model matches exactly
    with open(os.path.join(args.model_path, "host_state.json")) as f:
        host = json.load(f)
    config = TrainingConfig.from_json(host["config"])
    config = config.replace(
        data_root=args.dataset_root,
        json_file=args.json_file
        or os.path.join(args.dataset_root, "text_annos.json"),
    )
    # eval-time compute-path overrides (same param tree; gallery embedding
    # dominates eval time — docs/performance.md).  checkpoint_cache_tag keys
    # on every NUMERICS_PATH_FIELDS value, so overridden paths never share
    # cached gallery features with the exact path.
    overrides = {
        k: v
        for k, v in (
            ("block_impl", args.block_impl),
            ("attn_backend", args.attn_backend),
            ("gelu_impl", args.gelu_impl),
            ("token_keep", args.token_keep),
        )
        if v is not None
    }
    if args.token_keep == 0:
        # a token-reduce-TRAINED checkpoint carries token_reduce_train=True,
        # which config validation rejects at token_keep=0; eval never
        # trains, so the flag is moot here
        overrides["token_reduce_train"] = False
    if overrides:
        config = config.replace(**overrides)
    num_classes = host["num_classes"]

    if args.eval_split == "all":
        dataset = MultiModalDataset(config, split="val")
    else:
        from prcv2025reid_tpu.data.split import create_split_datasets

        train_ds, val_ds, _ = create_split_datasets(config)
        dataset = val_ds if args.eval_split == "val" else train_ds
        logging.info(
            "eval_split=%s: %d of the root's records (ID-disjoint split from "
            "checkpoint config val_ratio=%s seed=%s)",
            args.eval_split, len(dataset.records), config.val_ratio, config.seed,
        )
    tokenizer = build_tokenizer(
        config.tokenizer_vocab_path, config.text_vocab_size, config.text_context_length
    )

    model = MultiModalReIDModel(config=config, num_classes=num_classes)
    rng = jax.random.PRNGKey(0)
    B, S = 2, config.image_size
    variables = model.init(
        {"params": rng},
        jnp.zeros((B, len(config.vision_modalities), S, S, 3), jnp.float32),
        jnp.ones((B, len(config.vision_modalities)), jnp.float32),
        jnp.zeros((B, config.text_context_length), jnp.int32),
        jnp.ones((B,), jnp.float32),
        train=False,
    )
    tx = build_optimizer(config, variables["params"], steps_per_epoch=1)
    template = TrainState.create(
        variables["params"], variables["batch_stats"], tx, jax.random.PRNGKey(1)
    )
    ckpt_path = os.path.abspath(args.model_path)  # abspath strips trailing /
    state, _ = restore_checkpoint(
        os.path.dirname(ckpt_path), template, name=os.path.basename(ckpt_path)
    )
    eval_vars = {"params": state.params, "batch_stats": state.batch_stats}

    embed_fns = {}

    def embed_factory(mods):
        mods = tuple(mods)
        if mods not in embed_fns:
            if args.fusion_mode == "weighted" and len(mods) > 1:
                embed_fns[mods] = make_weighted_embed_step(model, mods)
            else:
                embed_fns[mods] = make_combo_embed_step(model, mods)
        return embed_fns[mods]

    # cache key must change with the checkpoint and the compute path — the
    # shared helper holds the rules (evaluation/protocol.py)
    from prcv2025reid_tpu.evaluation.protocol import checkpoint_cache_tag

    ckpt_tag = checkpoint_cache_tag(
        state.params,
        f"{args.cache_tag}_ep{host.get('epoch', 0)}",
        step=int(state.step),
        config=config,
        weighted=args.fusion_mode == "weighted",
    )
    # sharded embedding + ranking over every visible chip (degenerate 1-chip
    # mesh on a single device — one code path, SURVEY.md §5.8)
    from prcv2025reid_tpu.parallel.mesh import batch_sharding, create_mesh
    from prcv2025reid_tpu.parallel.tp import shard_state

    # config honors a checkpoint-pinned mesh_shape (parallel/mesh.py); a
    # pinned 2-D (data, model) mesh that this host cannot build (fewer
    # devices) degrades to the plain data-parallel mesh — the pin is a
    # topology hint, not an eval-correctness property
    try:
        mesh = create_mesh(config=config, batch_size=args.batch_size)
    except ValueError as e:
        print(f"[eval] checkpoint-pinned mesh unavailable here ({e}); "
              "falling back to data-parallel over visible devices")
        mesh = create_mesh(batch_size=args.batch_size)
    sharding = batch_sharding(mesh) if mesh.devices.size > 1 else None
    if sharding is not None:
        # params must live on the same device set as the sharded batches
        # (tensor-parallel placement on a 2-D mesh, replicated on 1-D)
        eval_vars = shard_state(eval_vars, mesh)
    rerank = None
    if args.rerank:
        rerank = {
            "top_n": args.rerank_top_n,
            "k1": args.rerank_k1,
            "k2": args.rerank_k2,
            "lam": args.rerank_lambda,
        }
    result = evaluate_protocol(
        None,
        eval_vars,
        dataset,
        tokenizer,
        batch_size=args.batch_size,
        include_patterns=None,  # full MM-1..4 protocol
        exclude_same_image=args.exclude_same_image,
        cache=GalleryCache(args.cache_dir, ckpt_tag),
        sample_ratio=args.sample_ratio,
        embed_factory=embed_factory,
        sharding=sharding,
        mesh=mesh,
        rerank=rerank,
    )
    print(json.dumps(result, indent=2, default=float))

    if args.submission:
        n = export_submission_csv(
            None,
            eval_vars,
            dataset,
            tokenizer,
            args.submission,
            batch_size=args.batch_size,
            top_k=args.topk if args.topk is not None else config.rank_topk,
            embed_factory=embed_factory,
            mesh=mesh,
            sharding=sharding,  # gallery embed sharded like the eval above
            rerank=rerank,
        )
        logging.info("submission: %d rows -> %s", n, args.submission)
    return result


if __name__ == "__main__":
    main()
