"""Run every example (the reference's full oracle-demo sweep)."""
import importlib
import sys
import time

MODULES = ["matvec", "residual_norm", "jacobi", "chebyshev", "power_method",
           "soc_interp", "vcycle", "multigrid_pcg", "train_jacobi", "train_diffusion",
           "band_layout", "unstructured_ell", "distributed"]


def main():
    here = __file__.rsplit("/", 1)[0]
    sys.path.insert(0, here)                       # the example modules
    sys.path.insert(0, here.rsplit("/", 1)[0])     # the repo root
    failures = []
    for name in MODULES:
        print(f"\n=== {name} " + "=" * (60 - len(name)))
        t0 = time.time()
        try:
            importlib.import_module(name).main()
            print(f"--- {name} ok ({time.time() - t0:.1f}s)")
        except Exception as e:  # noqa: BLE001 — report-and-continue sweep
            failures.append(name)
            print(f"--- {name} FAILED: {type(e).__name__}: {e}")
    print(f"\n{len(MODULES) - len(failures)}/{len(MODULES)} examples passed")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
