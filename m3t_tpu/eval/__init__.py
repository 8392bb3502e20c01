from m3t_tpu.eval import metrics
from m3t_tpu.eval.rbot_evaluator import RBOTEvaluator
from m3t_tpu.eval.ycb_evaluator import YCBEvaluator
from m3t_tpu.eval.opt_evaluator import OPTEvaluator
from m3t_tpu.eval.choi_evaluator import ChoiEvaluator
from m3t_tpu.eval.rtb_evaluator import RTBEvaluator
