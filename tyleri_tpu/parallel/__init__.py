"""tyleri_tpu.parallel subpackage."""
