"""Run the multi-chip training dryrun at 16 and 32 virtual devices and
record MULTICHIP-style results (VERDICT r2 #5).

Each n spawns a fresh CPU interpreter with n virtual devices (the same
path the driver uses for __graft_entry__.dryrun_multichip): a REAL sharded
SFT step executes on the recipe mesh (n=16 -> dp1 x fsdp8 x tp2,
n=32 -> dp2 x fsdp8 x tp2) and must produce a finite loss.

Writes MULTICHIP_scale.json at the repo root.
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(n: int) -> dict:
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count={n}"
                        ).strip()
    env["JAX_PLATFORMS"] = "cpu"
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import __graft_entry__ as g; "
            f"g._dryrun_multichip_impl({n})")
    t0 = time.time()
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=HERE,
                       capture_output=True, text=True, timeout=1800)
    tail = (r.stdout + r.stderr).strip().splitlines()[-3:]
    return {"n_devices": n, "rc": r.returncode, "ok": r.returncode == 0,
            "seconds": round(time.time() - t0, 1), "tail": "\n".join(tail)}


def main():
    results = [run_one(n) for n in (16, 32)]
    out = os.path.join(HERE, "MULTICHIP_scale.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))
    if not all(r["ok"] for r in results):
        sys.exit(1)


if __name__ == "__main__":
    main()
