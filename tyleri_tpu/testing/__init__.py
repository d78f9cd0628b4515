"""tyleri_tpu.testing subpackage."""
