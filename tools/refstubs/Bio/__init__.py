class Seq:  # imported by the reference but unused in the exercised paths
    pass
