"""MJCF front-end: parser, model builder, oracle harness, asset paths.

Scene XMLs are vendored under `mj_envs_tpu/assets/` (written by
`tools/extract_assets.py`) so the framework is self-contained; the
read-only reference checkout is only needed for differential/parity
testing against the mujoco oracle.
"""
import os

VENDORED_ASSETS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets")

_TASK_XML = {
    "hammer": "DAPG_hammer.xml",
    "door": "DAPG_door.xml",
    "pen": "DAPG_pen.xml",
    "relocate": "DAPG_relocate.xml",
}


def task_xml_path(task: str) -> str:
    """Runtime scene XML for a task: the vendored copy when present,
    otherwise the reference checkout (useful before extract_assets has
    run, e.g. in a fresh clone with the reference mounted)."""
    vendored = os.path.join(VENDORED_ASSETS, _TASK_XML[task])
    if os.path.exists(vendored):
        return vendored
    from . import oracle as O
    return O.task_xml_path(task)
