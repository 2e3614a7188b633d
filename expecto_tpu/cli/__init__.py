"""Argparse front-ends reproducing the reference scripts' CLI contracts.

Each module's ``main(argv=None)`` mirrors one reference script:

    chromatin        <- chromatin.py       (VCF -> per-shift .diff.h5)
    predict          <- predict.py         (h5 + genes + model -> sed.tsv,
                                            or --modelList -> output.csv)
    train            <- train.py / train_bootstrap.py
    compute_features <- compute_expecto_features.py
    merge            <- merge_predict_batched.py et al.

Run as ``python -m expecto_tpu.cli.<name> ...``.
"""
