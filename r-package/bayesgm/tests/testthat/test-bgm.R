test_that("BGM fit + imputation", {
  if (!nzchar(Sys.getenv("RETICULATE_PYTHON")) ||
      !nzchar(Sys.getenv("BAYESGM_PYTHONPATH"))) {
    skip("Python backend not configured")
  }
  skip_if_not(bayesgm_available())

  set.seed(2)
  data <- matrix(rnorm(80 * 4), 80, 4)
  m <- BGM$new(params = list(
    z_dim = 2L, g_units = c(8L, 8L), e_units = c(8L, 8L),
    dz_units = c(8L), dx_units = c(8L)
  ), random_seed = 2L)
  m$fit(data, epochs = 0L, use_egm_init = FALSE)
  test <- data[1:10, ]
  test[, 2] <- NA
  res <- m$predict(test, alpha = 0.2, n_mcmc = 5L, burn_in = 10L)
  expect_equal(dim(res$imputed), c(10L, 4L))
  expect_false(anyNA(res$imputed[, 2]))
})
