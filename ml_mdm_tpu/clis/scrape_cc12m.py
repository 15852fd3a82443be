"""CC12M dataset acquisition CLI (reference clis/scrape_cc12m.py):
img2dataset download -> webdataset tars -> parquet-to-TSV conversion
(tar/file/caption columns) -> train/validation index split.

img2dataset needs network; the conversion/split stages work on existing
downloads, so re-building indexes offline is supported.
"""
from __future__ import annotations

import argparse
import glob
import logging
import os


def download(tsv_url_list: str, output_dir: str, image_size: int = 256,
             processes: int = 16, threads: int = 64):
    try:
        from img2dataset import download as i2d_download
    except ImportError as e:
        raise RuntimeError(
            "img2dataset is not installed; run the download stage on a "
            "machine with network access, then use --stage convert here."
        ) from e
    i2d_download(
        processes_count=processes,
        thread_count=threads,
        url_list=tsv_url_list,
        image_size=image_size,
        output_folder=output_dir,
        output_format="webdataset",
        input_format="tsv",
        url_col="url",
        caption_col="caption",
        enable_wandb=False,
        number_sample_per_shard=10000,
        distributor="multiprocessing",
    )


def convert_parquets(output_dir: str):
    """Each img2dataset shard writes NNNNN.parquet + NNNNN.tar; emit a
    per-shard TSV with (tar, file, caption) rows."""
    import pandas as pd

    shard_tsvs = []
    for parquet in sorted(glob.glob(os.path.join(output_dir, "*.parquet"))):
        base = os.path.splitext(parquet)[0]
        tar = base + ".tar"
        if not os.path.exists(tar):
            continue
        df = pd.read_parquet(parquet)
        ok = df[df["status"] == "success"] if "status" in df else df
        out = base + ".tsv"
        with open(out, "w") as f:
            f.write("tar\tfile\tcaption\n")
            for _, row in ok.iterrows():
                caption = str(row.get("caption", "")).replace("\t", " ")
                caption = caption.replace("\n", " ")
                f.write(f"{tar}\t{row['key']}.jpg\t{caption}\n")
        shard_tsvs.append(out)
    logging.info(f"converted {len(shard_tsvs)} shards")
    return shard_tsvs


def split_index(output_dir: str, validation_shards: int = 1):
    shard_tsvs = sorted(glob.glob(os.path.join(output_dir, "*.tsv")))
    shard_tsvs = [t for t in shard_tsvs if not t.endswith("training.tsv")
                  and not t.endswith("validation.tsv")]
    val = shard_tsvs[:validation_shards]
    train = shard_tsvs[validation_shards:]
    for name, lst in (("training.tsv", train), ("validation.tsv", val)):
        with open(os.path.join(output_dir, name), "w") as f:
            f.write("filename\n")
            for t in lst:
                f.write(t + "\n")
    logging.info(
        f"index split: {len(train)} train / {len(val)} validation shards"
    )


def main(argv=None):
    p = argparse.ArgumentParser(description="cc12m scraper")
    p.add_argument("--url-list", type=str, default="cc12m.tsv",
                   help="TSV with url/caption columns")
    p.add_argument("--output-dir", type=str, default="cc12m")
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--stage", type=str, default="all",
                   choices=["all", "download", "convert", "split"])
    p.add_argument("--validation-shards", type=int, default=1)
    args = p.parse_args(argv)

    os.makedirs(args.output_dir, exist_ok=True)
    if args.stage in ("all", "download"):
        download(args.url_list, args.output_dir, args.image_size)
    if args.stage in ("all", "convert"):
        convert_parquets(args.output_dir)
    if args.stage in ("all", "split"):
        split_index(args.output_dir, args.validation_shards)


if __name__ == "__main__":
    logging.basicConfig(level="INFO")
    main()
