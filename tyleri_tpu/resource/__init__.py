"""tyleri_tpu.resource subpackage."""
