"""Evaluate on train+valid+test (parity with reference
``test_on_three_sets.py``)."""
import logging
import sys

from mlvae_tpu.cli.experiment import prepare_experiment


def main(argv=None):
    logging.basicConfig(level=logging.INFO, stream=sys.stdout)
    prepared = prepare_experiment(
        argv if argv is not None else sys.argv[1:], prepare_exp_dir=False
    )
    hparams = prepared["hparams"]
    model = prepared["model"]
    for dataset in prepared["datasets"]:
        model.evaluate(
            dataset,
            max_key=hparams["model"].get("max_key"),
            min_key=hparams["model"].get("min_key"),
            test_loader_kwargs=hparams["test_dataloader_opts"],
        )
    return model


if __name__ == "__main__":
    main()
