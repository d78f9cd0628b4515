"""tyleri_tpu.device subpackage."""
