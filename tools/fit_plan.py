#!/usr/bin/env python
"""Print per-chip HBM fit plans for the flagship presets at TP 1..8.

ref: gpu_mem_autosize.rs decision traces + layer_split.rs 70B planning;
here sharded-TP accounting (parallel/fit.py), validated by
tests/test_fit_plan.py."""

import json
import sys

sys.path.insert(0, "/root/repo")

from ferrum_tpu.models.configs import preset
from ferrum_tpu.parallel.fit import plan_fit


def main():
    for name in ("llama-3.1-8b", "qwen3-15b-a3b", "qwen3-30b-a3b",
                 "llama-3.3-70b"):
        cfg = preset(name)
        for tp in (1, 2, 4, 8):
            p = plan_fit(cfg, name, tp=tp)
            print(json.dumps(p.as_dict()))


if __name__ == "__main__":
    main()
