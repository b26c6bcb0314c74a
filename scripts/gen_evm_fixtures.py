"""Regenerate the frozen EVM verifier fixtures (fixtures/evm/*.json).

Run on CPU:  python scripts/gen_evm_fixtures.py [name ...]
(names: transcript grand_product hyperkzg spartan; default: all)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_backend_optimization_level=0")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
from jolt_tpu.utils.caches import enable_persistent_compilation_cache  # noqa: E402

enable_persistent_compilation_cache(jax)

import json  # noqa: E402

from jolt_tpu.evm import fixtures  # noqa: E402

GENERATORS = {
    "transcript": fixtures.transcript_fixture,
    "grand_product": fixtures.grand_product_fixture,
    "hyperkzg": fixtures.hyperkzg_fixture,
    "spartan": fixtures.spartan_fixture,
}

out_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures", "evm")
os.makedirs(out_dir, exist_ok=True)
names = sys.argv[1:] or list(GENERATORS)
for name in names:
    print(f"[fixtures] generating {name} ...", flush=True)
    data = GENERATORS[name]()
    tmp = os.path.join(out_dir, f".{name}.tmp")
    with open(tmp, "w") as f:
        json.dump(data, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, f"{name}.json"))
    print(f"[fixtures] wrote {name}.json", flush=True)
