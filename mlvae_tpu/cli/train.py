"""Train entry point (parity with reference ``train.py``)."""
import logging
import sys

from mlvae_tpu.cli.experiment import prepare_experiment


def main(argv=None):
    logging.basicConfig(level=logging.INFO, stream=sys.stdout)
    prepared = prepare_experiment(
        argv if argv is not None else sys.argv[1:], prepare_exp_dir=True
    )
    hparams = prepared["hparams"]
    train_dataset, valid_dataset, test_dataset = prepared["datasets"]
    model = prepared["model"]
    model.fit(
        hparams["model"]["epoch_counter"],
        train_dataset,
        valid_dataset,
        train_loader_kwargs=hparams["train_dataloader_opts"],
        valid_loader_kwargs=hparams["valid_dataloader_opts"],
    )
    return model


if __name__ == "__main__":
    main()
