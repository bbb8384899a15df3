"""Flagship signal-chain models composed from the framework's ops."""

from simpledsp_tpu.models.northstar import (
    NorthStarChain,
    ShardedNorthStarChain,
    default_design,
)
from simpledsp_tpu.models.sdr import FMReceiverBank, SDRState
from simpledsp_tpu.models.sdr import AMReceiverBank
from simpledsp_tpu.models.audio import (MelSpectrogram, griffin_lim,
                                        mel_filterbank, mfcc)
from simpledsp_tpu.models.comms import (Constellation, LinearModem,
                                        OFDMModem, awgn, ber)
