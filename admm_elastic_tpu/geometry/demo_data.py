"""Self-contained demo sample data (VERDICT r1 item 8).

The reference ships .node/.ele meshes under samples/data/ (SURVEY 2.20:
bunny_1124, torus, sphere, ...). This repo generates equivalents at first
use — no network, no dependence on the read-only reference mount — and
caches them as .node/.ele files under <repo>/data/ so the demos exercise
the same file-loading path (geometry/io.load_elenode) as the reference.

Load priority per mesh name:
1. $ADMM_DATA_DIR/<name>.node (user-provided data, e.g. the reference's
   own samples/data to run the original scenes byte-identically),
2. <repo>/data/<name>.node (generated on first call, then cached),
3. procedural factory directly (if the data dir is unwritable).
"""

from __future__ import annotations

import os

from admm_elastic_tpu.geometry import factory
from admm_elastic_tpu.geometry.io import load_elenode, save_elenode

_REPO_DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "data",
)

def _scaled(mesh, s: float):
    mesh.apply_xform(factory.make_xform(scale=(s,) * 3))
    return mesh


# name -> procedural generator (bunny-class blob; analytic torus/sphere).
# Scales match the reference data the demos were written against (the
# real bunny_1124 is ~0.15 m across; demos then apply their own xforms).
GENERATORS = {
    "bunny_1124": lambda: _scaled(factory.make_tet_bunny_like(600), 0.08),
    "bunny_2250": lambda: _scaled(factory.make_tet_bunny_like(1200), 0.08),
    "torus": lambda: factory.make_tet_torus(1.0, 0.35, 24, 4),
    "sphere": lambda: factory.make_tet_sphere(0.5, 6),
    "box768": lambda: factory.make_tet_blocks(4, 8, 4, cell=0.25),
}


def load_demo_mesh(name: str, fallback=None):
    """Load a demo mesh by reference-data name (see module docstring)."""
    user_dir = os.environ.get("ADMM_DATA_DIR")
    if user_dir and os.path.exists(os.path.join(user_dir, name + ".node")):
        return load_elenode(os.path.join(user_dir, name))

    base = os.path.join(_REPO_DATA, name)
    if os.path.exists(base + ".node"):
        return load_elenode(base)

    gen = GENERATORS.get(name, fallback)
    if gen is None:
        raise FileNotFoundError(
            f"no demo mesh {name!r}: not in ADMM_DATA_DIR, {_REPO_DATA}, "
            f"or GENERATORS"
        )
    mesh = gen()
    try:
        os.makedirs(_REPO_DATA, exist_ok=True)
        save_elenode(mesh, base)
        return load_elenode(base)  # exercise the same IO path every run
    except OSError:
        return mesh  # unwritable checkout: serve the procedural mesh
