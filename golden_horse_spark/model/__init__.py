"""Pure-NumPy model core: featurizer, dictionaries, CRF scoring/decoding,
span evaluation. No Spark imports here — this package is broadcast to
executors and also runs standalone as the single-process "oracle" the
distributed pipeline is tested against.
"""
