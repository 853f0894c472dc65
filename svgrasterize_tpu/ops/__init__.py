from . import compose, coverage, fill_rule, gradient, blur, morphology
