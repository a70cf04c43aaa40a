from .numeric import calc_diff, count_bytes, assert_bitwise_equal
from .bench import bench, bench_profiled
