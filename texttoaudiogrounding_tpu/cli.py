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
    raise SystemExit(f"unknown runner '{name}'")


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser(prog="texttoaudiogrounding_tpu")
    parser.add_argument("runner", help="strong | weak_phrase | "
                        "weak_phrase_selfsup | weak_sentence | inference")
    parser.add_argument("command", nargs="?", default=None,
                        help="train | evaluate | train_evaluate | "
                        "evaluate_psds | evaluate_random | debug | "
                        "calc_params")
    parser.add_argument("--config", default=None)
    parser.add_argument("--eval_config", default=None)
    parser.add_argument("--experiment_path", default=None)
    parser.add_argument("--audio", default=None)
    parser.add_argument("--phrase", default=None)
    parser.add_argument("--output", default=None)
    parser.add_argument("overrides", nargs="*",
                        help="key.path=value config overrides")
    args = parser.parse_args(argv)

    if args.runner == "inference":
        from texttoaudiogrounding_tpu.inference import run_inference
        return run_inference(experiment_path=args.experiment_path,
                             audio=args.audio, phrase=args.phrase,
                             output=args.output)

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
    if command == "calc_params":
        return runner.calc_params(args.config, args.overrides)
    raise SystemExit(f"unknown command '{command}'")


if __name__ == "__main__":
    main()
