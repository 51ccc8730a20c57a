from flexq_tpu.utils.benchmark import bandwidth_gbs, bench_fn, tflops
