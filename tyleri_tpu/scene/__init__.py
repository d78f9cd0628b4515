"""tyleri_tpu.scene subpackage."""
