"""External DNN-HMM scoring entry (parity with reference
``test_external.py``): load the computed datasets + external results and
score forced alignment / DNN-HMM output against ground truth."""
import logging
import sys

from mlvae_tpu.cli.args import parse_arguments
from mlvae_tpu.hyperyaml import load_hyperyaml, recursive_update
from mlvae_tpu.hyperyaml.loader import _parse_tagged


def main(argv=None):
    logging.basicConfig(level=logging.INFO, stream=sys.stdout)
    args = argv if argv is not None else sys.argv[1:]
    hparams_file, run_opts, overrides_str = parse_arguments(args)

    overrides = _parse_tagged(overrides_str) if overrides_str else {}
    overrides = overrides or {}
    extra_overrides = overrides.pop("extra_overrides", {}) or {}
    with open(hparams_file) as fin:
        hparams = load_hyperyaml(fin, [extra_overrides, overrides])
    # keep_objects: this re-merge runs AFTER materialization — a dict
    # override must not clobber a constructed object (see experiment.py)
    recursive_update(hparams, extra_overrides, keep_objects=True)

    import importlib
    prepare_mod = importlib.import_module(
        f"mlvae_tpu.data.datasets.{hparams['dataset']}.prepare"
    )
    prepare_mod.prepare(**hparams["prepare"])

    from mlvae_tpu.data.data_io_external_source import prepare_datasets
    from mlvae_tpu.metrics.dnn_hmm import compute_dnn_hmm_metrics

    datasets, _ = prepare_datasets(hparams)
    return compute_dnn_hmm_metrics(datasets[2])


if __name__ == "__main__":
    main()
