"""tyleri_tpu.utils subpackage."""
