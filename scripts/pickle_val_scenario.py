"""Dump raw scenario protobuf bytes per index for WOSAC metric computation.

Parity target: /root/reference/scripts/pickle_val_scenario.py — the official
wosac metrics API needs the original Scenario proto per episode
(consumed hex-encoded by the val data loader, data_h5_womd.py:64-68).

Usage:
  python scripts/pickle_val_scenario.py --data-dir <womd_dir> --dataset validation --out-dir <dir>
"""

import pickle
from argparse import ArgumentParser
from pathlib import Path


def main():
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    parser = ArgumentParser()
    parser.add_argument("--data-dir", required=True)
    parser.add_argument("--dataset", default="validation")
    parser.add_argument("--out-dir", required=True)
    args = parser.parse_args()

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    files = sorted(str(p) for p in (Path(args.data_dir) / args.dataset).glob("*"))
    ds = tf.data.TFRecordDataset(files, compression_type="")
    for i, rec in enumerate(ds):
        with open(out / f"{i}.pickle", "wb") as f:
            pickle.dump(bytes(rec.numpy()), f)
    print(f"pickled {i + 1} scenarios")


if __name__ == "__main__":
    main()
