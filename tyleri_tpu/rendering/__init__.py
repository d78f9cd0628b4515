"""tyleri_tpu.rendering subpackage."""
