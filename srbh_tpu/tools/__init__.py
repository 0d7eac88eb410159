"""Host-side toolboxes: preprocessing, product comparison, SwinIR harness."""
