#!/usr/bin/env python
"""TartanAir downloader (S3-compatible Cloudflare R2 bucket).

Counterpart of the reference's `data/download_tartanair.py`. Selects zip
shards by modality/difficulty/camera-side filters and fetches them from the
TartanAir project's public read-only R2 bucket (the credentials below are
the ones the TartanAir maintainers publish in their official download tool
— they grant anonymous read access only).

Differences from the reference tool: already-downloaded shards are skipped
(resumable) instead of aborting the whole run, and the shard list is derived
from the bucket listing with one filter function instead of ten boolean
flag combinations.
"""

from __future__ import annotations

import argparse
import os
import sys

BUCKET = "tartanair-v1"
ENDPOINT = "https://0a585e9484af268a716f8e6d3be53bbc.r2.cloudflarestorage.com"
ACCESS_KEY = "be0116e42ced3fd52c32398b5003ecda"
SECRET_KEY = "103fab752dab348fa665dc744be9b8fb6f9cf04f82f9409d79c54a88661a0d40"


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description="TartanAir shard downloader")
    ap.add_argument("--output-dir", default="./")
    for flag in ("rgb", "depth", "flow", "seg"):
        ap.add_argument(f"--{flag}", action="store_true")
    ap.add_argument("--only-easy", action="store_true")
    ap.add_argument("--only-hard", action="store_true")
    ap.add_argument("--only-left", action="store_true")
    ap.add_argument("--only-right", action="store_true")
    ap.add_argument("--only-flow", action="store_true")
    ap.add_argument("--only-mask", action="store_true")
    return ap.parse_args(argv)


def want(key: str, a: argparse.Namespace) -> bool:
    """Does bucket key (e.g. 'abandonedfactory/Hard/image_left.zip') pass
    the modality/difficulty/side filters?"""
    if not key.endswith(".zip"):
        return False
    if a.only_easy and "/Hard/" in key:
        return False
    if a.only_hard and "/Easy/" in key:
        return False
    base = os.path.basename(key)
    side_ok = not (
        (a.only_left and base.endswith("_right.zip"))
        or (a.only_right and base.endswith("_left.zip"))
    )
    if base.startswith("image_"):
        return a.rgb and side_ok
    if base.startswith("depth_"):
        return a.depth and side_ok
    if base.startswith("seg_"):
        return a.seg and side_ok
    if base.startswith("flow_"):
        if not a.flow:
            return False
        if a.only_flow and base == "flow_mask.zip":
            return False
        if a.only_mask and base == "flow_flow.zip":
            return False
        return True
    return False


def list_bucket(s3):
    token, keys = None, []
    while True:
        kw = dict(Bucket=BUCKET, MaxKeys=1000)
        if token:
            kw["ContinuationToken"] = token
        resp = s3.list_objects_v2(**kw)
        keys.extend(o["Key"] for o in resp.get("Contents", []))
        if not resp.get("IsTruncated"):
            return keys
        token = resp.get("NextContinuationToken")


def main(argv=None) -> int:
    args = parse_args(argv)
    if not os.path.isdir(args.output_dir):
        print(f"output dir {args.output_dir} does not exist", file=sys.stderr)
        return 1
    try:
        import boto3  # noqa: F401 — optional, not in the base image
    except ImportError:
        print(
            "boto3 is required for the TartanAir R2 download "
            "(pip install boto3), or fetch the shard list in "
            "data/download_training_zipfiles.txt via any S3 client against\n"
            f"  endpoint={ENDPOINT} bucket={BUCKET}",
            file=sys.stderr,
        )
        return 2
    s3 = boto3.client(
        "s3",
        endpoint_url=ENDPOINT,
        aws_access_key_id=ACCESS_KEY,
        aws_secret_access_key=SECRET_KEY,
    )
    keys = [k for k in list_bucket(s3) if want(k, args)]
    print(f"{len(keys)} shards selected")
    for k in keys:
        # flatten 'env/Difficulty/file.zip' -> 'env_Difficulty_file.zip'
        dst = os.path.join(args.output_dir, k.replace("/", "_"))
        if os.path.isfile(dst):
            print(f"  skip (exists): {dst}")
            continue
        print(f"  {k} -> {dst}")
        s3.download_file(BUCKET, k, dst)
    return 0


if __name__ == "__main__":
    sys.exit(main())
