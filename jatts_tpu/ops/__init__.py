"""Pure jittable ops: masks, length regulation, alignment, DSP."""
