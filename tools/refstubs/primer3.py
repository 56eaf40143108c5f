"""primer3-py stub backed by krisp_tpu's thermodynamic design engine.

Translating the global-options dict back to the engine's parameters makes
the reference and krisp_tpu score candidates identically, so pipeline
parity tests isolate everything *except* libprimer3 itself.
"""

from krisp_tpu.thermo.design import design_primers


class bindings:
    @staticmethod
    def design_primers(seq_args, global_args):
        template = seq_args["SEQUENCE_TEMPLATE"]
        target_start, target_len = seq_args["SEQUENCE_TARGET"]
        amp = global_args["PRIMER_PRODUCT_SIZE_RANGE"][0]
        return design_primers(
            template, target_start, target_len,
            tm=(global_args["PRIMER_MIN_TM"], global_args["PRIMER_MAX_TM"]),
            gc=(global_args["PRIMER_MIN_GC"], global_args["PRIMER_MAX_GC"]),
            amp_size=tuple(amp),
            primer_size=(global_args["PRIMER_MIN_SIZE"],
                         global_args["PRIMER_MAX_SIZE"]),
            max_sec_tm=global_args["PRIMER_MAX_SELF_ANY_TH"],
            gc_clamp=global_args["PRIMER_GC_CLAMP"],
            max_end_gc=global_args["PRIMER_MAX_END_GC"])
