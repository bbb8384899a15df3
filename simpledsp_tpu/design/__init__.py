from simpledsp_tpu.design.biquad import (
    BiquadCascadeDesign,
    FilterType,
    design_bandpass,
    design_bandstop,
    design_highpass,
    design_lowpass,
    sos_matrix,
)
