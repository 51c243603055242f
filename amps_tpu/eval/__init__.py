from amps_tpu.eval.ber import recc_link_curve  # noqa: F401
