# Env-gated integration test: runs only when a configured Python backend is
# available (RETICULATE_PYTHON + BAYESGM_PYTHONPATH), like the reference.
test_that("CausalBGM fit + predict shapes", {
  if (!nzchar(Sys.getenv("RETICULATE_PYTHON")) ||
      !nzchar(Sys.getenv("BAYESGM_PYTHONPATH"))) {
    skip("Python backend not configured")
  }
  skip_if_not(bayesgm_available())

  set.seed(1)
  n <- 60; v_dim <- 4
  v <- matrix(rnorm(n * v_dim), n, v_dim)
  x <- matrix(rbinom(n, 1, 0.5), n, 1)
  y <- x + v[, 1] + 0.1 * rnorm(n)

  m <- CausalBGM$new(params = list(
    z_dims = c(1L, 1L, 1L, 2L), use_bnn = FALSE,
    g_units = c(8L, 8L), e_units = c(8L, 8L),
    f_units = c(8L), h_units = c(8L), dz_units = c(8L)
  ), random_seed = 1L)
  m$fit(x, y, v, epochs = 0L, use_egm_init = FALSE)
  res <- m$predict(x, y, v, alpha = 0.1, n_mcmc = 5L, burn_in = 10L)
  expect_length(res$effect, n)
  expect_equal(dim(res$interval), c(n, 2L))
})
