"""Resumable HuggingFace checkpoint downloader.

TPU-native analog of the reference's hf_download
(crates/ferrum-models/src/hf_download.rs:1-8): resolves a repo id, lists
files via the HF API, downloads safetensors/config/tokenizer with HTTP
range resumption, proxy support via standard env vars, and token auth.
Files land under $FERRUM_MODELS_DIR (default ~/.cache/ferrum-tpu/models).
"""

from __future__ import annotations

import json
import os
import sys
import urllib.error
import urllib.request
from typing import List, Optional

from ..types import ModelLoadError

HF_ENDPOINT = os.environ.get("HF_ENDPOINT", "https://huggingface.co")

_WANTED_SUFFIXES = (".safetensors", ".json", ".txt", ".model",
                    ".tiktoken", ".jinja")


def _request(url: str, token: Optional[str], method: str = "GET",
             headers: Optional[dict] = None) -> urllib.request.Request:
    h = dict(headers or {})
    if token:
        h["Authorization"] = f"Bearer {token}"
    h.setdefault("User-Agent", "ferrum-tpu/0.1")
    return urllib.request.Request(url, method=method, headers=h)


def list_repo_files(repo_id: str, revision: str = "main",
                    token: Optional[str] = None) -> List[str]:
    url = f"{HF_ENDPOINT}/api/models/{repo_id}/tree/{revision}?recursive=true"
    try:
        with urllib.request.urlopen(_request(url, token), timeout=30) as r:
            entries = json.load(r)
    except urllib.error.URLError as e:
        raise ModelLoadError(f"cannot list {repo_id}@{revision}: {e}")
    return [e["path"] for e in entries if e.get("type") == "file"]


def download_file(repo_id: str, path: str, dest: str, revision: str = "main",
                  token: Optional[str] = None, chunk: int = 1 << 20) -> None:
    """Range-resumable single-file download (.partial + rename)."""
    url = f"{HF_ENDPOINT}/{repo_id}/resolve/{revision}/{path}"
    partial = dest + ".partial"
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    offset = os.path.getsize(partial) if os.path.exists(partial) else 0
    headers = {"Range": f"bytes={offset}-"} if offset else {}
    req = _request(url, token, headers=headers)
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            mode = "ab" if offset and r.status == 206 else "wb"
            with open(partial, mode) as f:
                while True:
                    buf = r.read(chunk)
                    if not buf:
                        break
                    f.write(buf)
    except urllib.error.URLError as e:
        raise ModelLoadError(f"download failed for {path}: {e} "
                             f"(partial kept at {partial} for resume)")
    os.replace(partial, dest)


def download_model(repo_id: str, revision: str = "main",
                   token: Optional[str] = None,
                   dest_root: Optional[str] = None) -> str:
    """Download a full checkpoint; returns the local directory."""
    root = dest_root or os.path.expanduser(os.environ.get(
        "FERRUM_MODELS_DIR", "~/.cache/ferrum-tpu/models"))
    dest_dir = os.path.join(root, repo_id.replace("/", "--"))
    files = [f for f in list_repo_files(repo_id, revision, token)
             if f.endswith(_WANTED_SUFFIXES)]
    if not files:
        raise ModelLoadError(f"{repo_id} has no downloadable weight files")
    for i, f in enumerate(files):
        dest = os.path.join(dest_dir, f)
        if os.path.exists(dest):
            continue
        print(f"[{i + 1}/{len(files)}] {f}", file=sys.stderr)
        download_file(repo_id, f, dest, revision, token)
    return dest_dir
