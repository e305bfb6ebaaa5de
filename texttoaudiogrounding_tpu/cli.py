"""Command-line entry point.

Usage (mirrors the reference's fire-based runners,
run_strong.py:1295-1296, with explicit argparse):

    python -m texttoaudiogrounding_tpu.cli strong train \
        --config configs/strong/train.yaml [key.path=value ...]
    python -m texttoaudiogrounding_tpu.cli strong evaluate \
        --experiment_path exp/... --eval_config configs/strong/eval.yaml
    python -m texttoaudiogrounding_tpu.cli strong train_evaluate \
        --config ... --eval_config ...
    python -m texttoaudiogrounding_tpu.cli weak_phrase train --config ...
    python -m texttoaudiogrounding_tpu.cli inference \
        --experiment_path ... --audio x.wav --phrase "dog barking"
"""

from __future__ import annotations

import argparse
import sys


def _runner(name: str):
    if name == "strong":
        from texttoaudiogrounding_tpu.training.runner_strong import \
            StrongRunner
        return StrongRunner()
    if name == "weak_phrase":
        from texttoaudiogrounding_tpu.training.runner_weak_phrase import \
            WeakPhraseRunner
        return WeakPhraseRunner()
    if name == "weak_phrase_selfsup":
        from texttoaudiogrounding_tpu.training.runner_weak_phrase import \
            WeakPhraseSelfSupervisionRunner
        return WeakPhraseSelfSupervisionRunner()
    if name == "weak_sentence":
        from texttoaudiogrounding_tpu.training.runner_weak_sentence import \
            WeakSentenceRunner
        return WeakSentenceRunner()
    if name == "class_mapping_strong":
        from texttoaudiogrounding_tpu.training.runner_class_mapping import \
            ClassMappingStrongRunner
        return ClassMappingStrongRunner()
    if name == "class_mapping_weak":
        from texttoaudiogrounding_tpu.training.runner_class_mapping import \
            ClassMappingWeakRunner
        return ClassMappingWeakRunner()
    raise SystemExit(
        f"unknown runner '{name}' (expected strong | weak_phrase | "
        "weak_phrase_selfsup | weak_sentence | class_mapping_strong | "
        "class_mapping_weak | inference)")


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser(prog="texttoaudiogrounding_tpu")
    parser.add_argument("runner", help="strong | weak_phrase | "
                        "weak_phrase_selfsup | weak_sentence | "
                        "class_mapping_strong | class_mapping_weak | "
                        "inference")
    parser.add_argument("command", nargs="?", default=None,
                        help="train | evaluate | train_evaluate | "
                        "evaluate_psds | evaluate_random | debug | "
                        "calc_params | calc_params_macs")
    parser.add_argument("--config", default=None)
    parser.add_argument("--eval_config", default=None)
    parser.add_argument("--experiment_path", default=None)
    parser.add_argument("--audio", default=None)
    parser.add_argument("--phrase", default=None)
    parser.add_argument("--output", default=None)
    parser.add_argument("overrides", nargs="*",
                        help="key.path=value config overrides")
    args = parser.parse_args(argv)
    # a key=value token in the command slot is an override, not a command
    if args.command and "=" in args.command:
        args.overrides = [args.command] + args.overrides
        args.command = None

    if args.runner == "inference":
        from texttoaudiogrounding_tpu.inference import run_inference
        return run_inference(experiment_path=args.experiment_path,
                             audio=args.audio, phrase=args.phrase,
                             output=args.output)

    if args.runner == "export":
        # export <experiment_path> to a standalone deployment dir:
        #   ... export --experiment_path EXP --output OUT [which]
        from texttoaudiogrounding_tpu.deployment import export_deployment
        if not args.output:
            parser.error("export requires --output (deployment dir)")
        out = export_deployment(args.experiment_path, args.output,
                                which=args.command or "best")
        print(f"exported deployment -> {out}")
        return out

    if args.runner == "evaluate_desed":
        # zero-shot SED (reference python_scripts/evaluation/
        # evaluate_on_desed.py); overrides: wav=... gt=... duration=...
        from texttoaudiogrounding_tpu.evaluation.desed import \
            run_desed_evaluation
        from texttoaudiogrounding_tpu.utils.config import parse_overrides
        kw = parse_overrides(args.overrides)
        return run_desed_evaluation(
            args.experiment_path, kw["wav"], kw["gt"], kw["duration"],
            time_resolution=kw.get("time_resolution", 0.04))

    if args.runner == "evaluate_sed_eval":
        # event/segment-based F1 over prediction/ground-truth TSVs
        # (reference python_scripts/evaluation/evaluate_sed_eval.py)
        import pandas as pd

        from texttoaudiogrounding_tpu.evaluation.sed_metrics import \
            compute_sed_eval
        from texttoaudiogrounding_tpu.utils.config import parse_overrides
        kw = parse_overrides(args.overrides)
        ref = pd.read_csv(kw["reference"], sep="\t")
        est = pd.read_csv(kw["prediction"], sep="\t")
        event, segment = compute_sed_eval(
            ref, est, t_collar=kw.get("t_collar", 0.2),
            time_resolution=kw.get("time_resolution", 1.0))
        print(f"event-based F1 (micro): "
              f"{event['overall']['f_measure']:.4f}  "
              f"(macro): {event['class_wise_average']['f_measure']:.4f}")
        print(f"segment-based F1 (micro): "
              f"{segment['overall']['f_measure']:.4f}  "
              f"(macro): {segment['class_wise_average']['f_measure']:.4f}")
        return event, segment

    runner = _runner(args.runner)
    command = args.command or "train"
    if command == "train":
        return runner.train(args.config, args.overrides)
    if command == "evaluate":
        return runner.evaluate(args.experiment_path, args.eval_config,
                               args.overrides)
    if command == "train_evaluate":
        return runner.train_evaluate(args.config, args.eval_config,
                                     args.overrides)
    if command in ("evaluate_psds", "evaluate_th_auc",
                   "evaluate_collar_auc", "evaluate_intersection_auc",
                   "evaluate_psds_single", "evaluate_tagging"):
        return getattr(runner, command)(args.experiment_path,
                                        args.eval_config, args.overrides)
    if command == "evaluate_random":
        return runner.evaluate_random(args.eval_config, args.overrides)
    if command == "debug":
        return runner.debug(args.config, args.overrides)
    if command in ("calc_params", "calc_params_macs"):
        return getattr(runner, command)(args.config, args.overrides)
    raise SystemExit(f"unknown command '{command}'")


if __name__ == "__main__":
    main()
