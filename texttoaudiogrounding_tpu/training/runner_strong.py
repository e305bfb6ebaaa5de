"""Strongly-supervised TAG runner (frame-BCE training + PSDS/th-AUC eval).

Reference: python_scripts/training/run_strong.py.  Differences are
TPU-architectural, not behavioral: one jitted data-parallel train step,
batched (not batch-1) eval inference, and the 50-threshold decode loop
vectorized per sample.
"""

from __future__ import annotations

import math
from pathlib import Path

import jax
import numpy as np
import pandas as pd

from texttoaudiogrounding_tpu.evaluation.decode import decode_multi_threshold
from texttoaudiogrounding_tpu.evaluation.psds import (
    compute_psds,
    compute_psds_sed_scores,
)
from texttoaudiogrounding_tpu.evaluation.th_auc import compute_th_auc
from texttoaudiogrounding_tpu.parallel.mesh import (
    device_feed,
    pad_batch_to_multiple,
    shard_batch,
)
from texttoaudiogrounding_tpu.training.runner_base import (
    BaseRunner,
    array_batch,
)
from texttoaudiogrounding_tpu.utils.config import parse_config_or_kwargs
from texttoaudiogrounding_tpu.utils.registry import instantiate, register


def strong_output_transform(output: dict, batch: dict) -> dict:
    """Truncate frame_sim/label to a common length and clamp lengths.

    Reference: run_strong.py:107-118.
    """
    import jax.numpy as jnp
    frame_sim = output["frame_sim"]
    label = batch["label"].astype(frame_sim.dtype)
    t = min(frame_sim.shape[1], label.shape[1])
    length = jnp.clip(output["length"], 1, t)
    return {**output, "frame_sim": frame_sim[:, :t], "label": label[:, :t],
            "length": length}


def build_grounding_ground_truth(data: list) -> dict:
    """gt tables keyed by ``{audiocap_id}_{start_index}`` datapoints.

    Reference: run_strong.py:176-200 (zero-length segments skipped).
    """
    gt_list, gt_dict, fname_to_aid = [], {}, {}
    for audio_item in data:
        audiocap_id = audio_item["audiocap_id"]
        audio_id = audio_item["audio_id"]
        for phrase_item in audio_item["phrases"]:
            fname = f"{audiocap_id}_{phrase_item['start_index']}"
            gt_dict[fname] = []
            fname_to_aid[fname] = audio_id
            for onset, offset in phrase_item["segments"]:
                if onset == 0 and offset == 0:
                    continue
                gt_list.append({"filename": fname,
                                "event_label": "fake_event",
                                "onset": onset, "offset": offset,
                                "audio_id": audio_id})
                gt_dict[fname].append((onset, offset, "fake_event"))
    return {"gt_df": pd.DataFrame(gt_list), "gt_dict": gt_dict,
            "fname_to_aid": fname_to_aid}


@register("StrongRunner")
class StrongRunner(BaseRunner):

    # ---------------------------------------------------------------- train
    def train(self, config, overrides=None, **kwargs) -> Path:
        self.setup(config, overrides, **kwargs)
        exp_dir = self.prepare_experiment()
        train_loader = self.build_dataloader(self.config["data"]["train"],
                                             shuffle=True)
        val_loader = self.build_dataloader(self.config["data"]["val"],
                                           shuffle=False)
        model = self.build_model()
        loss_fn = self.build_loss()
        self.fit(model, loss_fn, train_loader, val_loader,
                 strong_output_transform, exp_dir)
        return exp_dir

    # ------------------------------------------------------------ inference
    def eval_inference(self, dataloader, model, state,
                       scores_per_sample=None) -> dict:
        """Run batched inference + vectorized multi-threshold decoding.

        Reference: run_strong.py:171-277 (decode loop vectorized; eval is
        batched with per-sample length slicing instead of batch_size=1).
        """
        eval_cfg = self.config.get("eval_config", {})
        n_thresholds = eval_cfg.get("n_thresholds", 50)
        thresholds = np.arange(1 / (n_thresholds * 2), 1, 1 / n_thresholds)
        window_size = self.config.get("inference_args",
                                      {}).get("window_size", 1)
        time_resolution = self._train_time_resolution()
        n_connect = math.ceil(0.5 / time_resolution)

        gt = build_grounding_ground_truth(dataloader.dataset.data)
        valid_fnames = set(gt["gt_df"]["filename"].unique()) \
            if len(gt["gt_df"]) else set()

        forward = self.make_forward(model)
        n_dev = self.mesh.devices.size
        pred_buffer: dict = {th: [] for th in thresholds}
        score_buffer: dict = {}
        for arr, batch, real_bs in device_feed(iter(dataloader), self.mesh,
                                               n_dev, prepare=array_batch):
            output = forward(state, arr)
            frame_sim = np.asarray(output["frame_sim"])
            lengths = np.asarray(output["length"])
            for idx in range(real_bs):
                fname = (f"{batch['audiocap_id'][idx]}_"
                         f"{batch['start_index'][idx]}")
                if fname not in valid_fnames:
                    continue
                scores = frame_sim[idx]
                if scores.ndim == 2:
                    scores = scores[:, 0]
                scores = scores[:max(int(lengths[idx]), 1)]
                if scores_per_sample is not None:
                    scores = scores_per_sample(scores)
                timestamps = np.arange(len(scores) + 1) * time_resolution
                score_buffer[fname] = pd.DataFrame({
                    "onset": timestamps[:-1],
                    "offset": timestamps[1:],
                    "fake_event": scores,
                })
                segs = decode_multi_threshold(
                    scores, thresholds, window_size=window_size,
                    connect_n=n_connect, time_resolution=time_resolution)
                for th, seg in zip(thresholds, segs):
                    for onset, offset in seg:
                        pred_buffer[th].append(
                            {"filename": fname,
                             "event_label": "fake_event",
                             "onset": onset, "offset": offset})

        for th in thresholds:
            pred_buffer[th] = pd.DataFrame(
                pred_buffer[th],
                columns=["filename", "event_label", "onset", "offset"])
        return {"pred_buffer": pred_buffer, "score_buffer": score_buffer,
                **gt}

    def _train_time_resolution(self) -> float:
        try:
            return self.config["data"]["train"]["dataset"]["args"][
                "time_resolution"]
        except KeyError:
            return 0.04

    # ------------------------------------------------------------- evaluate
    def evaluate(self, experiment_path, eval_config, overrides=None,
                 **kwargs) -> dict:
        """Full metric suite on the test set (reference
        run_strong.py:814-905): sed_scores-path PSDS over max_efprs +
        th-AUC over two ranges, predictions/plots dumped to the exp dir."""
        exp_dir, eval_config, model, state, dataloader = \
            self._load_for_eval(experiment_path, eval_config, overrides,
                                **kwargs)
        output = self.eval_inference(dataloader, model, state)
        return self._report_metrics(output, eval_config, exp_dir)

    def _copy_train_keys(self, test_cfg: dict,
                         keys=("vocabulary", "model_type")) -> None:
        """Copy train-time dataset/tokenizer args into the eval config
        (reference copy_args_recursive, run_strong.py:823-826)."""
        def rec(src, tgt):
            for k, v in src.items():
                if k == "args":
                    for key in v:
                        if key in keys:
                            tgt.setdefault("args", {})[key] = v[key]
                elif isinstance(v, dict) and isinstance(tgt.get(k), dict):
                    rec(v, tgt[k])
        rec(self.config["data"]["train"], test_cfg)

    def _report_metrics(self, output: dict, eval_config: dict,
                        exp_dir: Path) -> dict:
        pred_buffer = output["pred_buffer"]
        pred_dir = exp_dir / "predictions"
        pred_dir.mkdir(parents=True, exist_ok=True)
        for th, df in pred_buffer.items():
            df.to_csv(pred_dir / f"predictions_th_{th:.2f}.tsv", sep="\t",
                      index=False)

        duration = eval_config["data"]["test"]["duration"]
        results = {}
        out_path = exp_dir / eval_config.get("output", "result.txt")
        out_path.parent.mkdir(parents=True, exist_ok=True)
        with open(out_path, "w") as writer:
            for max_efpr in eval_config.get("max_efprs", [None]):
                psds = compute_psds_sed_scores(
                    scores=output["score_buffer"],
                    ground_truth=output["gt_dict"],
                    duration=duration,
                    fname_to_aid=output["fname_to_aid"],
                    dtc_threshold=0.5, gtc_threshold=0.5,
                    max_efpr=max_efpr,
                    save_dir=exp_dir / eval_config.get("psds_dir", "psds"))
                results[f"psds@{max_efpr}"] = psds
                line = f"max_efpr: {max_efpr}, psds: {psds:.1%}"
                print(line)
                print(line, file=writer)
            for min_th, max_th in zip([0.0, 0.2], [1.0, 0.8]):
                th_auc = compute_th_auc(
                    pred_buffer,
                    output["gt_df"].drop(columns=["event_label",
                                                  "audio_id"]),
                    dtc_threshold=0.5, gtc_threshold=0.5,
                    min_threshold=min_th, max_threshold=max_th,
                    save_dir=exp_dir / eval_config.get("th_auc_dir",
                                                       "th_auc"))
                results[f"th_auc@{min_th}-{max_th}"] = th_auc
                line = (f"threshold: {min_th:.2f} ~ {max_th:.2f}, "
                        f"th_auc: {th_auc:.1%}")
                print(line)
                print(line, file=writer)
        return results

    def _load_for_eval(self, experiment_path, eval_config,
                       overrides=None, **kwargs):
        """Shared eval boilerplate: reload exp config, rebuild model,
        restore checkpoint, build the test loader."""
        eval_config = parse_config_or_kwargs(eval_config, overrides or [],
                                             **kwargs)
        exp_dir = Path(experiment_path)
        self.setup(exp_dir / "config.yaml")
        if eval_config.get("model_overrides"):
            # e.g. {audio_encoder: {args: {dtype: bfloat16}}} to evaluate
            # a checkpoint in the bf16/int8 serving configuration
            from texttoaudiogrounding_tpu.utils.config import \
                merge_a_into_b
            merge_a_into_b(eval_config["model_overrides"],
                           self.config["model"])
        self.config["eval_config"] = {
            "n_thresholds": eval_config.get("n_thresholds", 50)}
        inf_args = {"window_size": eval_config.get("window_size", 1)}
        if "time_resolution" in eval_config:
            inf_args["time_resolution"] = eval_config["time_resolution"]
        if "word_aggregation" in eval_config:
            inf_args["word_aggregation"] = eval_config["word_aggregation"]
        self.config["inference_args"] = inf_args
        model = self.build_model()
        test_cfg = eval_config["data"]["test"]
        self._copy_train_keys(test_cfg)
        dataloader = self.build_dataloader(test_cfg, shuffle=False)
        sample = next(iter(dataloader))
        which = eval_config.get("resume", "best").replace(".pth", "")
        state = self.restore_state(model, exp_dir, sample, which=which)
        return exp_dir, eval_config, model, state, dataloader

    def evaluate_psds(self, experiment_path, eval_config, overrides=None,
                      **kwargs) -> dict:
        """Operating-point PSDS variant (psds_eval path, reference
        run_strong.py:966-1052): dtc=gtc ∈ {0.1, 0.5, 0.7} scenarios."""
        exp_dir, eval_config, model, state, dataloader = \
            self._load_for_eval(experiment_path, eval_config, overrides,
                                **kwargs)
        output = self.eval_inference(dataloader, model, state)
        results = {}
        for dtc_gtc in eval_config.get("dtc_gtc_thresholds",
                                       [0.1, 0.5, 0.7]):
            value = compute_psds(
                output["pred_buffer"], output["gt_df"],
                eval_config["data"]["test"]["duration"],
                dtc_threshold=dtc_gtc, gtc_threshold=dtc_gtc,
                max_efpr=eval_config.get("max_efpr"))
            results[f"psds_op@dtc=gtc={dtc_gtc}"] = value
            print(f"dtc=gtc={dtc_gtc}: psds={value:.1%}")
        return results

    def evaluate_th_auc(self, experiment_path, eval_config, overrides=None,
                        **kwargs) -> dict:
        """Standalone th-AUC over the full threshold range (reference
        run_strong.py:1054-1116)."""
        exp_dir, eval_config, model, state, dataloader = \
            self._load_for_eval(experiment_path, eval_config, overrides,
                                **kwargs)
        output = self.eval_inference(dataloader, model, state)
        value = compute_th_auc(
            output["pred_buffer"],
            output["gt_df"].drop(columns=["event_label", "audio_id"]),
            dtc_threshold=0.5, gtc_threshold=0.5,
            save_dir=exp_dir / eval_config.get("th_auc_dir", "th_auc"))
        print(f"th_auc_scenario1: {value:.1%}")
        return {"th_auc": value}

    def evaluate_collar_auc(self, experiment_path, eval_config,
                            overrides=None, **kwargs) -> dict:
        """Collar-based F-score-curve AUC (reference
        run_strong.py:1118-1163)."""
        from texttoaudiogrounding_tpu.evaluation.curves import \
            collar_fscore_curve

        exp_dir, eval_config, model, state, dataloader = \
            self._load_for_eval(experiment_path, eval_config, overrides,
                                **kwargs)
        output = self.eval_inference(dataloader, model, state)
        collar = eval_config.get("collar", 0.2)
        result = collar_fscore_curve(
            output["score_buffer"], output["gt_dict"],
            onset_collar=collar, offset_collar=collar,
            offset_collar_rate=eval_config.get("offset_collar_rate", 0.2),
            num_thresholds=eval_config.get("n_thresholds", 50))
        print(f"collar auc: {result['auc']:.2%}")
        return {"collar_auc": result["auc"]}

    def evaluate_intersection_auc(self, experiment_path, eval_config,
                                  overrides=None, **kwargs) -> dict:
        """Intersection-criteria threshold AUC + best F1 (reference
        run_strong.py:1166-1207)."""
        from texttoaudiogrounding_tpu.evaluation.curves import \
            intersection_fscore_curve

        exp_dir, eval_config, model, state, dataloader = \
            self._load_for_eval(experiment_path, eval_config, overrides,
                                **kwargs)
        output = self.eval_inference(dataloader, model, state)
        result = intersection_fscore_curve(
            output["score_buffer"], output["gt_dict"],
            dtc_threshold=0.5, gtc_threshold=0.5,
            num_thresholds=eval_config.get("n_thresholds", 50))
        print(f"intersection auc: {result['score']:.2%}")
        print(f"best f1: {result['f_max']:.2%}")
        return {"intersection_auc": result["score"],
                "best_f1": result["f_max"]}

    def evaluate_psds_single(self, experiment_path, eval_config,
                             overrides=None, **kwargs) -> pd.DataFrame:
        """Per-sample PSDS: each audio item scored through the full metric
        pipeline individually (reference run_strong.py:1219-1263)."""
        exp_dir, eval_config, model, state, dataloader = \
            self._load_for_eval(experiment_path, eval_config, overrides,
                                **kwargs)
        dataset = dataloader.dataset
        all_data = list(dataset.data)
        duration = eval_config["data"]["test"]["duration"]
        results = []
        for single in all_data:
            dataset.data = [single]
            if hasattr(dataset, "generate_index"):
                dataset.generate_index()
            output = self.eval_inference(dataloader, model, state)
            if len(output["gt_df"]) == 0:
                continue
            psds = compute_psds_sed_scores(
                scores=output["score_buffer"],
                ground_truth=output["gt_dict"], duration=duration,
                fname_to_aid=output["fname_to_aid"],
                dtc_threshold=0.5, gtc_threshold=0.5,
                max_efpr=eval_config.get("max_efpr"))
            results.append({"audiocap_id": single["audiocap_id"],
                            "psds": psds})
        dataset.data = all_data
        if hasattr(dataset, "generate_index"):
            dataset.generate_index()
        df = pd.DataFrame(results)
        out = eval_config.get("output")
        if out:
            df.to_csv(exp_dir / out, sep="\t", index=False)
        return df

    # -------------------------------------------------------- sanity floors
    def evaluate_random(self, eval_config, overrides=None, **kwargs) -> dict:
        """Uniform-random frame scores through the full metric pipeline
        (reference run_strong.py:279-380, 908-964)."""
        eval_config = parse_config_or_kwargs(eval_config, overrides or [],
                                             **kwargs)
        self.config = {"eval_config": {
            "n_thresholds": eval_config.get("n_thresholds", 50)},
            "inference_args": {
                "window_size": eval_config.get("window_size", 1)},
            "data": {"train": eval_config["data"].get(
                "train", eval_config["data"]["test"])}}
        self.mesh = None
        test_cfg = eval_config["data"]["test"]
        dataset = instantiate(test_cfg["dataset"])
        time_resolution = eval_config.get("time_resolution", 0.04)
        n_thresholds = eval_config.get("n_thresholds", 50)
        thresholds = np.arange(1 / (n_thresholds * 2), 1, 1 / n_thresholds)
        n_connect = math.ceil(0.5 / time_resolution)
        rng = np.random.default_rng(eval_config.get("seed", 0))

        gt = build_grounding_ground_truth(dataset.data)
        pred_buffer: dict = {th: [] for th in thresholds}
        score_buffer: dict = {}
        sr = getattr(dataset, "sample_rate", 32000)
        for audio_item in dataset.data:
            for phrase_item in audio_item["phrases"]:
                fname = (f"{audio_item['audiocap_id']}_"
                         f"{phrase_item['start_index']}")
                if fname not in gt["gt_dict"]:
                    continue
                duration = max(float(o) for _, o, _ in
                               gt["gt_dict"][fname]) if gt["gt_dict"][fname] \
                    else 10.0
                n_frames = int(duration / time_resolution) + 1
                scores = rng.uniform(size=n_frames).astype(np.float32)
                timestamps = np.arange(n_frames + 1) * time_resolution
                score_buffer[fname] = pd.DataFrame({
                    "onset": timestamps[:-1], "offset": timestamps[1:],
                    "fake_event": scores})
                segs = decode_multi_threshold(
                    scores, thresholds,
                    window_size=eval_config.get("window_size", 1),
                    connect_n=n_connect, time_resolution=time_resolution)
                for th, seg in zip(thresholds, segs):
                    for onset, offset in seg:
                        pred_buffer[th].append(
                            {"filename": fname,
                             "event_label": "fake_event",
                             "onset": onset, "offset": offset})
        for th in thresholds:
            pred_buffer[th] = pd.DataFrame(
                pred_buffer[th],
                columns=["filename", "event_label", "onset", "offset"])
        results = {}
        for max_efpr in eval_config.get("max_efprs", [None]):
            results[f"psds@{max_efpr}"] = compute_psds_sed_scores(
                scores=score_buffer, ground_truth=gt["gt_dict"],
                duration=eval_config["data"]["test"]["duration"],
                fname_to_aid=gt["fname_to_aid"], max_efpr=max_efpr)
        results["th_auc@0.0-1.0"] = compute_th_auc(
            pred_buffer,
            gt["gt_df"].drop(columns=["event_label", "audio_id"]))
        return results

    # ----------------------------------------------------------------- misc
    def train_evaluate(self, train_config, eval_config,
                       overrides=None, **kwargs) -> dict:
        exp_dir = self.train(train_config, overrides, **kwargs)
        return self.evaluate(exp_dir, eval_config)

    def debug(self, config, overrides=None, iters: int = 3, **kwargs):
        """Few forward/backward iterations to validate shapes/grads
        (reference run_strong.py:1267-1276)."""
        self.setup(config, overrides, **kwargs)
        train_loader = self.build_dataloader(self.config["data"]["train"],
                                             shuffle=True)
        model = self.build_model()
        loss_fn = self.build_loss()
        batch = array_batch(next(iter(train_loader)))
        state = self.init_state(model, batch)
        step = self.make_train_step(model, loss_fn,
                                    strong_output_transform)
        rng = jax.random.PRNGKey(0)
        n_dev = self.mesh.devices.size
        for i in range(iters):
            b, _ = pad_batch_to_multiple(batch, n_dev)
            b = shard_batch(b, self.mesh)
            state, loss = step(state, b, rng)
            print(f"debug iter {i}: loss={float(np.asarray(loss)):.4f}")
        return state

    def calc_params(self, config, overrides=None, **kwargs) -> int:
        """Parameter count only (see :meth:`calc_params_macs`)."""
        return self.calc_params_macs(config, overrides, **kwargs)["params"]

    def calc_params_macs(self, config, overrides=None, **kwargs) -> dict:
        """Params + MACs/FLOPs on the reference probe input — 10 s @
        32 kHz audio + 5-token text (reference thop.profile at
        run_strong.py:1278-1291).  FLOPs come from the compiled forward's
        XLA cost analysis; MACs = FLOPs / 2 (thop counts multiply-adds)."""
        self.setup(config, overrides, **kwargs)
        model = self.build_model()
        sr = 32000
        batch = {"waveform": np.zeros((1, 10 * sr), np.float32),
                 "waveform_len": np.array([10 * sr], np.int32),
                 "text": np.zeros((1, 5), np.int32),
                 "text_len": np.array([5], np.int32)}
        if hasattr(model, "text_forward_keys"):  # MultiText phrase axis
            batch["text"] = batch["text"][:, None]
            batch["text_len"] = batch["text_len"][:, None]
        variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                               train=False)
        n = sum(int(np.prod(x.shape))
                for x in jax.tree.leaves(variables["params"]))

        def fwd(variables, batch):
            return model.apply(variables, batch, train=False)["frame_sim"]

        cost = jax.jit(fwd).lower(variables, batch).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):  # older jax returns [dict]
            cost = cost[0]
        flops = int(cost.get("flops", 0))
        result = {"params": n, "flops": flops, "macs": flops // 2}
        print(f"params: {n}  flops: {flops:.4g}  macs: {flops / 2:.4g}")
        return result
