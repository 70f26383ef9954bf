"""CI coverage of the hardware-validation entry point itself.

The real purpose of `run_sharded_hardware_check` is to Mosaic-compile the
sharded kernels on the TPU (bench.py `sharded` stanza, VERDICT r3 item 4).
Here it runs on the virtual 8-device CPU mesh in interpret mode so the
check's own plumbing — mesh construction, padded layouts, oracle
comparisons — stays green without hardware.
"""

from gnnla_tpu.parallel.hardware_check import run_sharded_hardware_check


def test_hardware_check_interpret_mode():
    out = run_sharded_hardware_check(interpret=True, n_stream=96,
                                     n_vcycle=64, n_stencil=48,
                                     n_timing_iters=2)
    assert out["ok"]
    assert out["ndev"] == 8
    assert out["stream_spmv_rel_err"] < 1e-5
    assert out["stream_vjp_x_rel_err"] < 1e-5
    assert out["stream_vcycle_rel_err"] < 1e-4
    assert out["stencil_rel_err"] < 1e-5
