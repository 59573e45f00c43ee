"""Oracle harness: load the reference MJCF through the installed `mujoco`
(3.x) for differential testing.

The reference assets target MuJoCo 2.1 (`DAPG_assets.xml:3` uses `apirate`)
and reference STL meshes from a git submodule that is broken in the snapshot
(`dependencies/Adroit`).  Meshes are visual-only in this suite (all mesh
geoms resolve to class D_Vizual with contype=conaffinity=0 and every meshed
body has an explicit <inertial>), so we sanitize: drop mesh geoms/assets and
file textures, strip unknown 2.1 attributes.  The result is physically
identical to what mujoco-py 2.1 simulated, modulo engine-version differences.

Used by tests and by `tools/extract_assets.py`; never needed at runtime.
"""
from __future__ import annotations

import os
import tempfile
import xml.etree.ElementTree as ET

REFERENCE_ASSETS = "/root/reference/mj_envs_vision/hand_manipulation_suite/assets"
TASK_XML = {
    "hammer": "DAPG_hammer.xml",
    "door": "DAPG_door.xml",
    "pen": "DAPG_pen.xml",
    "relocate": "DAPG_relocate.xml",
}


def _inline_includes(path: str) -> ET.Element:
    tree = ET.parse(path)
    root = tree.getroot()
    base = os.path.dirname(os.path.abspath(path))

    def expand(elem: ET.Element):
        i = 0
        while i < len(elem):
            child = elem[i]
            if child.tag == "include":
                sub = _inline_includes(os.path.join(base, child.get("file")))
                elem.remove(child)
                for k, s in enumerate(list(sub)):
                    elem.insert(i + k, s)
            else:
                expand(child)
                i += 1

    expand(root)
    return root


def sanitize(task_xml_path: str) -> str:
    """Return sanitized single-file MJCF (as XML text) loadable by mujoco 3."""
    root = _inline_includes(task_xml_path)
    if root.tag == "mujocoinclude":
        root.tag = "mujoco"

    def walk(elem: ET.Element):
        for child in list(elem):
            tag = child.tag
            if tag == "geom" and (
                child.get("mesh") is not None
                or child.get("type") == "mesh"
                or child.get("class") == "D_Vizual"
            ):
                elem.remove(child)
                continue
            if tag == "mesh":
                elem.remove(child)
                continue
            if tag == "texture" and child.get("file") is not None:
                elem.remove(child)
                continue
            if tag == "material":
                child.attrib.pop("texture", None)
            if tag == "option":
                child.attrib.pop("apirate", None)
            if tag == "size":
                # njmax/nconmax/nstack are legacy hints in 3.x.
                for k in ("njmax", "nconmax", "nstack"):
                    child.attrib.pop(k, None)
            if tag == "compiler":
                child.attrib.pop("meshdir", None)
                child.attrib.pop("texturedir", None)
            if tag == "default":
                # D_Vizual default sets type="mesh"; harmless once no geom
                # uses the class, but strip to be safe.
                walk(child)
                continue
            walk(child)

    walk(root)
    return ET.tostring(root, encoding="unicode")


def load_oracle(task: str):
    """Compile the sanitized reference model with the installed mujoco."""
    import mujoco

    xml = sanitize(os.path.join(REFERENCE_ASSETS, TASK_XML[task]))
    with tempfile.NamedTemporaryFile(
            "w", suffix=".xml", delete=False) as f:
        f.write(xml)
        path = f.name
    try:
        return mujoco.MjModel.from_xml_path(path)
    finally:
        os.unlink(path)


def task_xml_path(task: str) -> str:
    return os.path.join(REFERENCE_ASSETS, TASK_XML[task])
