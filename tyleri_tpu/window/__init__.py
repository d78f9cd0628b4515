"""tyleri_tpu.window subpackage."""
