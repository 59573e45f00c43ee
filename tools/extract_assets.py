"""Vendor the task MJCF models into `mj_envs_tpu/assets/`.

Reads the reference scene XMLs (include graph rooted at
`/root/reference/mj_envs_vision/hand_manipulation_suite/assets/
DAPG_{task}.xml`), applies the same sanitize pass the oracle harness uses
(inline includes, drop visual-only mesh geoms / mesh assets / file
textures — see `mj_envs_tpu/mjcf/oracle.py`), and writes one
self-contained XML per task.  After this, the framework runs without the
reference mounted; parity tests still read the reference path directly.

    python tools/extract_assets.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mj_envs_tpu.mjcf import oracle as O
from mj_envs_tpu.mjcf import VENDORED_ASSETS


def main():
    os.makedirs(VENDORED_ASSETS, exist_ok=True)
    for task, fname in O.TASK_XML.items():
        src = os.path.join(O.REFERENCE_ASSETS, fname)
        xml = O.sanitize(src)
        dst = os.path.join(VENDORED_ASSETS, fname)
        with open(dst, "w") as f:
            f.write(
                "<!-- Vendored from the reference suite"
                " (mj_envs_vision/hand_manipulation_suite/assets/"
                f"{fname}), includes inlined and visual-only mesh assets"
                " stripped by tools/extract_assets.py.  The physics is"
                " unchanged: mesh geoms are contype=conaffinity=0 and all"
                " meshed bodies carry explicit inertials. -->\n")
            f.write(xml)
        print(f"{task}: wrote {dst} ({os.path.getsize(dst)} bytes)")


if __name__ == "__main__":
    main()
