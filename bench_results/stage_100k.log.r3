WARNING:2026-08-19 09:48:41,386:jax._src.xla_bridge:905: Platform 'axon' is experimental and not all JAX functionality may be correctly supported!

=== g=256 gsrc=256 L=160 (C=400, width=160) counts mean=40.8 max=78 rescored rows/src=10438
bound    5.88 ms | table   7.86 ms | rescore   11.33 ms | nn_full   18.09 ms | full_iter   15.83 ms

=== g=128 gsrc=256 L=256 (C=800, width=256) counts mean=56.3 max=104 rescored rows/src=7202
bound    6.87 ms | table   7.86 ms | rescore   11.49 ms | nn_full   20.96 ms | full_iter   20.98 ms

=== g=64 gsrc=256 L=512 (C=1600, width=512) counts mean=77.9 max=132 rescored rows/src=4988
bound   11.10 ms | table   6.70 ms | rescore   12.94 ms | nn_full   28.81 ms | full_iter   28.58 ms

=== g=256 gsrc=128 L=160 (C=400, width=160) counts mean=34.4 max=71 rescored rows/src=8813
bound    5.52 ms | table   8.03 ms | rescore   16.25 ms | nn_full   25.30 ms | full_iter   24.24 ms

=== g=128 gsrc=128 L=256 (C=800, width=256) counts mean=45.7 max=85 rescored rows/src=5846
bound    7.11 ms | table   9.05 ms | rescore   16.59 ms | nn_full   32.12 ms | full_iter   30.56 ms

=== g=512 gsrc=256 L=160 (C=200, width=160) counts mean=29.9 max=62 rescored rows/src=15305
bound    4.37 ms | table   7.11 ms | rescore   14.14 ms | nn_full   17.74 ms | full_iter   16.84 ms

=== g=256 gsrc=512 L=160 (C=400, width=160) counts mean=49.2 max=93 rescored rows/src=12605
bound    6.99 ms | table   6.83 ms | rescore    9.47 ms | nn_full   13.10 ms | full_iter  236.86 ms

dense kernel: 42.07 ms
