"""DeepSeek-V2/V3-class MLA (+MoE) model — flagship family.

Filled in by the MLA/MoE milestone; this module must import cleanly for the
registry.
"""

# Implemented in a subsequent milestone (MLA attention + MoE EP).
