"""tyleri_tpu.ops subpackage."""
